"""Spatial statistics — global Moran's I autocorrelation over a cell
grid (engine-added; the reference projects and measures but never asks
"is this surface clustered?", the first question a spatial analyst puts
to a gridded aggregate).

Moran's I over the OCCUPIED cells of a rollup, rook contiguity:

    I = (n / W) * Σ_ij w_ij z_i z_j / Σ_i z_i²

with w_ij = 1 for occupied rook neighbors (E/W wrap across the
antimeridian — same convention as ``index.cells.neighbors_np``; N/S clip
at the poles), W the number of DIRECTED neighbor pairs, z the deviation
from the occupied-cell mean.

Scale shape: one map-side-combinable count-per-cell aggregate, a 1-row
broadcast for (n, mean), a 4-way in-task neighbor fan-out joined back to
the cell table on the neighbor id (equi-join of two cell-sized tables —
never the point corpus), and a single global reduce.  Determinism: the
mean is sum/count of exact integer sums (bit-identical across engines),
so z is bit-identical; the remaining float sums carry ~1e-13 relative
spread vs the ×1e6 output quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import _scale


def morans_i(cells: DataFrame, res: int, cell: str = "cell_id",
             val: str = "cnt") -> DataFrame:
    """Global Moran's I of ``val`` over occupied cells at ``res``.

    Returns ONE row: (n_cells, w_pairs, moran_i).  Cells are row-major
    ids (ix * 2^res + iy).  Isolated cells contribute to n and the
    denominator but no pairs; if no pairs exist at all W = 0 and the
    result row carries a null I rather than dividing by zero.
    """
    n_s = _scale(res)
    # Spark inlines CTEs: z feeds THREE consumers (neighbor fan-out, the
    # join's build side, the denominator), and without materialization
    # each replays the upstream cell rollup — at corpus scale that is N
    # extra full scans (observed: 17 exchanges vs 5).  The z table is
    # O(occupied cells), so an eager localCheckpoint is cheap and
    # truncates the replay (same discipline as operators/cluster.py).
    base = cells.select(F.col(cell).alias("c"), F.col(val).cast("long").alias("v"))
    g = base.agg(
        F.count("*").alias("n_cells"),
        (F.sum("v").cast("double") / F.count("*")).alias("mean_v"),
    )
    z = base.crossJoin(F.broadcast(g)).select(
        "c", (F.col("v") - F.col("mean_v")).alias("z"), "n_cells"
    ).localCheckpoint()
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    east = ((ix + 1) % n_s) * n_s + iy
    west = ((ix - 1 + n_s) % n_s) * n_s + iy
    north = F.when(iy + 1 < n_s, ix * n_s + iy + 1)
    south = F.when(iy - 1 >= 0, ix * n_s + iy - 1)
    nbrs = z.select(
        "z",
        F.explode(
            F.array_compact(F.array(east, west, north, south))
        ).alias("nc"),
    )
    pairs = nbrs.join(
        z.select(F.col("c").alias("nc"), F.col("z").alias("z2")), "nc"
    )
    num = pairs.agg(
        F.count("*").alias("w_pairs"), F.sum(F.col("z") * F.col("z2")).alias("num")
    )
    den = z.groupBy("n_cells").agg(F.sum(F.col("z") ** 2).alias("den"))
    return den.crossJoin(num).select(
        F.col("n_cells"),
        F.col("w_pairs"),
        F.when(
            (F.col("w_pairs") > 0) & (F.col("den") > 0.0),
            (F.col("n_cells").cast("double") / F.col("w_pairs"))
            * F.col("num") / F.col("den"),
        ).alias("moran_i"),
    )


def getis_ord_gstar(cells: DataFrame, res: int, cell: str = "cell_id",
                    val: str = "cnt") -> DataFrame:
    """Local Getis-Ord G* hot/cold-spot score per occupied cell.

        G*_i = (Σ_j∈N*(i) x_j − x̄·W_i) / (S·√((n·W_i − W_i²)/(n−1)))

    with N*(i) the rook neighborhood INCLUDING i itself (the "star"
    variant; E/W wrap, N/S clip — same lattice as ``morans_i``), W_i its
    occupied size, x̄ and S the global mean / standard deviation.
    |G*| ≳ 2 flags a significant hot (positive) or cold (negative) spot.

    Determinism is total: Σx, Σx², the per-cell Σ_j x_j and W_i are all
    EXACT integer aggregates, and the float formula on top is the same
    operation sequence in both engines — the output is bit-identical,
    not merely within-quantum.  Same materialization discipline as
    ``morans_i`` (the cell table feeds the fan-out and the join build).
    Degenerate guards: null G* when n < 2 or S = 0.
    """
    n_s = _scale(res)
    base = cells.select(
        F.col(cell).alias("c"), F.col(val).cast("long").alias("v")
    ).localCheckpoint()
    g = base.agg(
        F.count("*").alias("n_cells"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
    )
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    east = ((ix + 1) % n_s) * n_s + iy
    west = ((ix - 1 + n_s) % n_s) * n_s + iy
    north = F.when(iy + 1 < n_s, ix * n_s + iy + 1)
    south = F.when(iy - 1 >= 0, ix * n_s + iy - 1)
    fan = base.select(
        F.col("c"),
        F.explode(
            F.array_compact(F.array(F.col("c"), east, west, north, south))
        ).alias("nc"),
    )
    hood = (
        fan.join(base.select(F.col("c").alias("nc"), F.col("v").alias("xv")),
                 "nc")
        .groupBy("c")
        .agg(F.sum("xv").alias("wsum"), F.count("*").alias("w_i"))
    )
    n = F.col("n_cells").cast("double")
    mean = F.col("sum_v").cast("double") / n
    s = F.sqrt(F.col("sum_v2").cast("double") / n - mean * mean)
    wi = F.col("w_i").cast("double")
    denom = s * F.sqrt((n * wi - wi * wi) / (n - 1.0))
    return hood.crossJoin(F.broadcast(g)).select(
        F.col("c").alias(cell),
        F.col("w_i"),
        F.when(
            (F.col("n_cells") > 1) & (s > 0.0),
            (F.col("wsum").cast("double") - mean * wi) / denom,
        ).alias("gstar"),
    )

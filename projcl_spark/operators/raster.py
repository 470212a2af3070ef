"""Raster focal ops over a distributed DEM table — engine-added.

The reference samples and warps rasters (kernel/pl_sample.opencl) but
never derives terrain products from them; slope/aspect/hillshade is the
canonical next step for the same grid data.  A DEM at 100 TB arrives as
rows (gi, gj, elev), not as an in-memory array, so the 3×3 Horn stencil
must be expressed relationally.

Plan shape — the point of this operator: Horn's kernel is SEPARABLE.
dz/dx = ((z₃+2z₆+z₉) − (z₁+2z₄+z₇)) / 8dx is a vertical [1,2,1] smooth
followed by a horizontal central difference (and dz/dy the transpose), so
the whole stencil is three window passes (partition-by-column, by-row,
by-column) with ZERO data amplification — against the naive formulation
(explode every cell to its 9 neighbors → groupBy), this trades one
9×-volume shuffle for three 1×-volume shuffles of a 24-byte row, all
whole-stage codegen, no Python.  Borders (any missing neighbor) are
dropped, matching the interior-only semantics of array hillshade tools.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dem_hillshade(
    dem: DataFrame,
    dx_m: float,
    dy_m: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    gi: str = "gi",
    gj: str = "gj",
    elev: str = "elev",
) -> DataFrame:
    """Slope, aspect and hillshade for every interior cell of a DEM.

    ``dem`` holds one row per grid cell: ``gi`` (column index, +x east),
    ``gj`` (row index, +y north), ``elev`` meters.  ``dx_m``/``dy_m`` are
    the cell sizes in meters.  Returns (gi, gj, slope_rad, aspect_rad,
    hillshade) with hillshade in [0, 255] (unquantized double; callers
    round).  Aspect is atan2(dz/dy, −dz/dx) — 0 = +x/east, counter-
    clockwise positive — and the light azimuth is measured the same way,
    so the formula is convention-closed.
    """
    col_w = Window.partitionBy(gi).orderBy(F.col(gj).asc())
    row_w = Window.partitionBy(gj).orderBy(F.col(gi).asc())

    z = F.col(elev)
    # TWO window passes, not three (the flow_d8 discipline): pass 1 lags
    # the row (W/E neighbors), pass 2 lags/leads pass-1's columns so all
    # eight neighbors are in scope, and both smoothed differences fold in
    # the same projection.  Bit-exact vs the former three-pass form: the
    # row smooth rs = (lag(z) + 2z) + lead(z) is re-associated here as
    # the SAME operand order over the shifted columns, so every double is
    # identical; null (border) semantics — all 8 neighbors must exist —
    # are unchanged.  One fewer Exchange+Sort over the full DEM.
    p1 = dem.select(
        gi, gj, elev,
        F.lag(elev).over(row_w).alias("_zw"),
        F.lead(elev).over(row_w).alias("_ze"),
    )
    # rs at the N/S neighbors (for dz/dy) and cs at the E/W neighbors
    # (for dz/dx), all from one column pass
    rs_n = (F.lead("_zw").over(col_w) + 2.0 * F.lead(elev).over(col_w)
            + F.lead("_ze").over(col_w))
    rs_s = (F.lag("_zw").over(col_w) + 2.0 * F.lag(elev).over(col_w)
            + F.lag("_ze").over(col_w))
    cs_e = (F.lag("_ze").over(col_w) + 2.0 * F.col("_ze")
            + F.lead("_ze").over(col_w))
    cs_w = (F.lag("_zw").over(col_w) + 2.0 * F.col("_zw")
            + F.lead("_zw").over(col_w))
    dzdy = (rs_n - rs_s) / (8.0 * dy_m)
    dzdx = (cs_e - cs_w) / (8.0 * dx_m)
    d3 = p1.select(gi, gj, dzdy.alias("_dzdy"), dzdx.alias("_dzdx")).where(
        F.col("_dzdx").isNotNull() & F.col("_dzdy").isNotNull()
    )

    slope = F.atan(F.sqrt(F.col("_dzdx") * F.col("_dzdx")
                          + F.col("_dzdy") * F.col("_dzdy")))
    aspect = F.atan2(F.col("_dzdy"), -F.col("_dzdx"))
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(azimuth_deg)
    hs = 255.0 * F.greatest(
        F.lit(0.0),
        math.cos(zen) * F.cos(slope)
        + math.sin(zen) * F.sin(slope) * F.cos(az - aspect),
    )
    return d3.select(
        gi, gj,
        slope.alias("slope_rad"),
        aspect.alias("aspect_rad"),
        hs.alias("hillshade"),
    )


def gaussian_weights(radius: int, sigma: float) -> list[float]:
    """Normalized 1-D Gaussian taps for the separable KDE blur — computed
    once in Python so the engine column and the SQL oracle embed the SAME
    float literals."""
    raw = [math.exp(-(k * k) / (2.0 * sigma * sigma))
           for k in range(-radius, radius + 1)]
    s = sum(raw)
    return [w / s for w in raw]


def kde_smooth(
    cells: DataFrame,
    res: int,
    radius: int = 2,
    sigma: float = 1.0,
    cell_id: str = "cell_id",
    cnt: str = "cnt",
) -> DataFrame:
    """Separable Gaussian KDE over a SPARSE cell-count table (heatmap
    smoothing): each count spreads to (2·radius+1) neighbors per axis in
    two scatter-gather passes, so total work is O(nnz · (2r+1) · 2)
    instead of the O(nnz · (2r+1)²) of a 2-D stencil — the same
    separability trick as ``dem_hillshade`` §19, but scatter-based
    because the input is sparse (window lag/lead over sparse rows would
    treat missing cells as adjacent, which is wrong).

    Longitude wraps (ix modulo 2^res — cylinder topology, consistent with
    ``index.cells``); latitude contributions falling off the grid are
    dropped (truncated kernel).  Returns (cell_id, density).  The density
    is an order-dependent float sum; callers quantize (micro-units leave
    ~9 orders of headroom at gate magnitudes).
    """
    n = 1 << res
    w = gaussian_weights(radius, sigma)
    taps = F.array(*[
        F.struct(F.lit(d).alias("d"), F.lit(wd).alias("w"))
        for d, wd in zip(range(-radius, radius + 1), w)
    ])
    base = cells.select(
        F.shiftright(F.col(cell_id), res).alias("ix"),
        F.col(cell_id).bitwiseAND(F.lit(n - 1)).alias("iy"),
        F.col(cnt).cast("double").alias("_v"),
    )
    px = (
        base.select("ix", "iy", "_v", F.explode(taps).alias("t"))
        .select(F.pmod(F.col("ix") + F.col("t.d"), F.lit(n)).alias("ix"),
                "iy", (F.col("_v") * F.col("t.w")).alias("_c"))
        .groupBy("ix", "iy").agg(F.sum("_c").alias("_v"))
    )
    py = (
        px.select("ix", "iy", "_v", F.explode(taps).alias("t"))
        .select("ix", (F.col("iy") + F.col("t.d")).alias("iy"),
                (F.col("_v") * F.col("t.w")).alias("_c"))
        .where((F.col("iy") >= 0) & (F.col("iy") < n))
        .groupBy("ix", "iy").agg(F.sum("_c").alias("_v"))
    )
    return py.select(
        (F.col("ix") * n + F.col("iy")).alias(cell_id),
        F.col("_v").alias("density"),
    )


def contour_cases(
    dem: DataFrame,
    level: float,
    gi: str = "gi",
    gj: str = "gj",
    elev: str = "elev",
) -> DataFrame:
    """Marching-squares classification at one iso level — the first stage
    of contour extraction (engine-added; the reference warps rasters but
    derives no isolines).

    Every 2×2 block, anchored at its south-west corner (gi, gj), gets the
    standard 4-bit case index: bit0 = SW, bit1 = SE, bit2 = NE, bit3 = NW,
    a bit set iff that corner's elevation exceeds ``level``.  ``n_segs``
    is the contour-segment count of the case (0 for empty/full 0 and 15,
    2 for the saddles 5 and 10, else 1).  Blocks missing a neighbor
    (grid edge) are dropped.

    Plan shape, same discipline as ``dem_hillshade``: one ``lead`` over
    the row window fetches the east corner, one ``lead`` pair over the
    column window fetches the two north corners — two 1×-volume window
    passes, zero data amplification, all whole-stage codegen (vs the
    naive explode-×4 + groupBy, a 4×-volume shuffle).

    Threshold caveat: ``corner > level`` is a BOOLEAN — it has no
    quantization headroom, so reproducible classification across engines
    needs an elevation that is EXACT in both (integer-valued surfaces,
    quantized rasters), not a transcendental whose last ulp differs
    between libm implementations.
    """
    row_w = Window.partitionBy(gj).orderBy(F.col(gi).asc())
    col_w = Window.partitionBy(gi).orderBy(F.col(gj).asc())

    d1 = dem.select(gi, gj, elev, F.lead(elev).over(row_w).alias("_ze"))
    d2 = d1.select(
        gi, gj, elev, "_ze",
        F.lead(elev).over(col_w).alias("_zn"),
        F.lead("_ze").over(col_w).alias("_zne"),
    ).where(F.col("_ze").isNotNull() & F.col("_zn").isNotNull()
            & F.col("_zne").isNotNull())

    def b(c):
        return F.when(c > level, 1).otherwise(0)

    case = (b(F.col(elev)) + 2 * b(F.col("_ze"))
            + 4 * b(F.col("_zne")) + 8 * b(F.col("_zn"))).cast("long")
    out = d2.select(gi, gj, case.alias("ms_case"))
    return out.withColumn(
        "n_segs",
        F.when(F.col("ms_case").isin(0, 15), 0)
         .when(F.col("ms_case").isin(5, 10), 2)
         .otherwise(1).cast("long"),
    )


def flow_d8(
    dem: DataFrame,
    gi: str = "gi",
    gj: str = "gj",
    elev: str = "elev",
) -> DataFrame:
    """D8 flow direction for every interior DEM cell: the ESRI code
    (E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128) of the steepest
    DOWNHILL neighbor, 0 for pits/flats; ties break to the LOWEST code
    — both rules explicit so the result is engine-independent.

    Same separable-window discipline as ``dem_hillshade``: pass 1 lags
    the row (W/E), pass 2 lags/leads pass-1's columns (N/S + the four
    diagonals come free as lags of the lagged row) — two 1×-volume
    shuffles, zero data amplification, no 8-way self-join.  Run it on
    an INTEGER surface and every drop comparison is exact (the gate
    query does; float DEMs inherit the usual last-ulp caveat).
    """
    row_w = Window.partitionBy(gj).orderBy(F.col(gi).asc())
    col_w = Window.partitionBy(gi).orderBy(F.col(gj).asc())
    p1 = dem.select(
        gi, gj, elev,
        F.lag(elev).over(row_w).alias("_zw"),
        F.lead(elev).over(row_w).alias("_ze"),
    )
    p2 = p1.select(
        gi, gj, elev, "_zw", "_ze",
        F.lag(elev).over(col_w).alias("_zs"),
        F.lead(elev).over(col_w).alias("_zn"),
        F.lag("_zw").over(col_w).alias("_zsw"),
        F.lead("_zw").over(col_w).alias("_znw"),
        F.lag("_ze").over(col_w).alias("_zse"),
        F.lead("_ze").over(col_w).alias("_zne"),
    ).where(
        F.col("_zw").isNotNull() & F.col("_ze").isNotNull()
        & F.col("_zs").isNotNull() & F.col("_zn").isNotNull()
        & F.col("_zsw").isNotNull() & F.col("_znw").isNotNull()
        & F.col("_zse").isNotNull() & F.col("_zne").isNotNull()
    )
    z = F.col(elev)
    # (code, neighbor) in ascending code order — the tie-break order
    hood = [(1, "_ze"), (2, "_zse"), (4, "_zs"), (8, "_zsw"),
            (16, "_zw"), (32, "_znw"), (64, "_zn"), (128, "_zne")]
    drops = [(code, z - F.col(c)) for code, c in hood]
    best = F.greatest(*[d for _, d in drops])
    dir_expr = F.lit(0)
    for code, d in reversed(drops):
        dir_expr = F.when(d == best, F.lit(code)).otherwise(dir_expr)
    return p2.select(
        gi, gj,
        F.when(best > 0, dir_expr).otherwise(F.lit(0)).cast("int")
        .alias("flow_dir"),
        best.alias("max_drop"),
    )


def flow_accumulation(
    dem: DataFrame,
    max_steps: int = 12,
    gi: str = "gi",
    gj: str = "gj",
    elev: str = "elev",
) -> DataFrame:
    """Bounded-horizon D8 flow accumulation: for every interior cell,
    how many upstream cells drain THROUGH it within ``max_steps`` hops
    of the steepest-descent graph (the hydrology primitive on top of
    ``flow_d8``; the horizon cap bounds rounds exactly like the CC/BFS
    loops — strict-downhill edges mean the graph is a DAG, so the walk
    needs no cycle guard).

    Plan: the flow function is an edge table (one row per non-pit
    cell); each round advances EVERY live token one step along its
    cell's single outgoing edge (equi-join on the current position) and
    counts arrivals — state is O(live tokens), strictly shrinking as
    tokens reach pits or the border; per-round arrival counts fold into
    one map-side-combinable aggregate at the end.  All integer.
    """
    d8 = flow_d8(dem, gi=gi, gj=gj, elev=elev)
    # target coords from the direction code (E=1 … NE=128)
    dx = {1: 1, 2: 1, 4: 0, 8: -1, 16: -1, 32: -1, 64: 0, 128: 1}
    dy = {1: 0, 2: -1, 4: -1, 8: -1, 16: 0, 32: 1, 64: 1, 128: 1}
    dxc = F.lit(0)
    dyc = F.lit(0)
    for code in (128, 64, 32, 16, 8, 4, 2, 1):
        dxc = F.when(F.col("flow_dir") == code, F.lit(dx[code])).otherwise(dxc)
        dyc = F.when(F.col("flow_dir") == code, F.lit(dy[code])).otherwise(dyc)
    edges = (
        d8.where(F.col("flow_dir") > 0)
        .select(F.col(gi).alias("si"), F.col(gj).alias("sj"),
                (F.col(gi) + dxc).alias("ti"), (F.col(gj) + dyc).alias("tj"))
        .localCheckpoint(eager=False)  # materializes in round 1's count
    )
    tokens = edges.select(F.col("si").alias("oi"), F.col("sj").alias("oj"),
                          F.col("si").alias("ci"), F.col("sj").alias("cj"))

    def _step(toks):
        # LAZY checkpoint: the emptiness ``count`` below is the round's
        # one driver action and doubles as the checkpoint materialization
        # (an eager checkpoint + isEmpty was two jobs per step; count —
        # not isEmpty — because take(1) would materialize only part of
        # the checkpointed RDD)
        return (
            toks.join(edges, (F.col("ci") == F.col("si"))
                      & (F.col("cj") == F.col("sj")))
            .select("oi", "oj", F.col("ti").alias("ci"),
                    F.col("tj").alias("cj"))
            .localCheckpoint(eager=False)
        )

    # One step per action; a two-steps-per-wave variant was tried and
    # REVERTED in r6 (the deeper single-job stage chain measured no
    # better than two shallow actions — same lesson as the CC loop).
    arrivals = []
    for _ in range(max_steps):
        moved = _step(tokens)
        if moved.count() == 0:
            break
        arrivals.append(moved.select(F.col("ci").alias(gi),
                                     F.col("cj").alias(gj)))
        tokens = moved
    if not arrivals:
        return d8.select(gi, gj).limit(0).withColumn(
            "acc", F.lit(0).cast("long"))
    allarr = arrivals[0]
    for a in arrivals[1:]:
        allarr = allarr.unionByName(a)
    return allarr.groupBy(gi, gj).agg(F.count("*").cast("long").alias("acc"))

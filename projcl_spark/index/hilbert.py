"""Hilbert space-filling-curve cell index — the locality-preserving
alternative to the Z-order index in ``index.cells``.

Why an engine needs both: Z-order is cheap (pure bit interleave) but has
long diagonal jumps — a range scan over a Z interval can touch cells far
apart on the map.  The Hilbert curve's consecutive ids are ALWAYS
grid-adjacent (verified exhaustively in tests), so sorting / bucketing a
100-TB point table by Hilbert id gives tighter file-level min/max pruning
for spatial range queries (the same reason Iceberg/Delta expose Hilbert
clustering as their premium spatial sort order).

One transliteration (``oracle.hilbert_stages_sql``) feeds the Spark
whole-stage-codegen path here AND the DuckDB oracle twin: the state is
all-integer, so the ids are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import oracle as O


def hilbert_cols(df: DataFrame, res: int, ix: str = "ix", iy: str = "iy",
                 out: str = "h") -> DataFrame:
    """Append Hilbert id ``out`` for integer cell coords (ix, iy) at
    ``res`` — ``res`` staged integer select-lists, all inside one
    whole-stage-codegen span (no UDF, no shuffle)."""
    stages = O.hilbert_stages_sql(res, ix, iy)
    for _, stage in stages:
        df = df.withColumns({c: F.expr(e) for c, e in stage.items()})
    return df.withColumn(out, F.col("hd").cast("long")).drop("hx", "hy", "hd")


def hilbert_np(ix, iy, res: int):
    """Vectorized numpy reference of the same recipe (tests + any
    Arrow-batch consumer)."""
    import numpy as np

    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (res - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, s - 1 - x, x)
        y2 = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def hilbert_ranges(cells_h: DataFrame, h: str = "h",
                   assume_unique: bool = False) -> DataFrame:
    """Collapse a set of Hilbert cell ids into maximal CONSECUTIVE id
    ranges — the scan-plan form of a spatial region: a box cover that
    compacts to a handful of (start, end) ranges is exactly what a
    reader pushes down as min/max predicates against a Hilbert-sorted
    table (the payoff of the curve's adjacency property; a Z-order
    cover of the same box fragments into many more runs).

    Islands-and-gaps: sort ids, run_id = h − row_number() (constant
    within a consecutive run), one aggregate per run.  Two window/agg
    stages over the CELL set (not the corpus).  All integer.
    """
    # ``assume_unique=True`` skips the de-dup shuffle when the caller's
    # id set is unique by construction (e.g. distinct (ix, iy) through
    # the bijective xy→h curve map) — a ``distinct`` on already-unique
    # data is a pure extra exchange (guide §2.4).
    w = Window.orderBy(F.col(h).asc())
    runs = cells_h.select(F.col(h).cast("long").alias("h"))
    if not assume_unique:
        runs = runs.distinct()
    runs = runs.withColumn("_rid", F.col("h") - F.row_number().over(w))
    return (
        runs.groupBy("_rid")
        .agg(F.min("h").alias("range_start"), F.max("h").alias("range_end"),
             F.count("*").alias("n_cells"))
        .select("range_start", "range_end", "n_cells")
    )

"""Rectangle-overlap (bbox) join — engine-added.

The spatial-join primitive PIP and dwithin don't cover: joining two
layers of axis-aligned boxes (viewport queries, raster chunk manifests,
R-tree-style pre-filters before exact geometry).  Reference parity: the
reference has no box join; this is the standard grid-partitioned
spatial-join recipe (e.g. SpatialSpark / Sedona's grid join) expressed
as pure Catalyst operators.

Plan shape — built for the 100-TB case:

- each box explodes to the coarse grid cells its envelope covers
  (``sequence`` × 2 → one codegen-side fan-out, fan bounded by
  box-size/cell-size);
- the candidate join is a plain (ix, iy) EQUI-join — shuffle-hash /
  sort-merge territory that AQE can skew-split, never a theta join;
- the exact overlap test refines candidates;
- duplicate candidates (a pair can co-occur in several cells) are
  eliminated for FREE with the canonical-cell trick: a pair is emitted
  only from the top-left cell of its overlap region, so no distinct()
  re-shuffle of the output is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BOX_COLS = ("lon_min", "lon_max", "lat_min", "lat_max")


def _cover(df: DataFrame, cell_deg: float, tag: str) -> DataFrame:
    ix0 = F.floor(F.col("lon_min") / cell_deg).cast("long")
    ix1 = F.floor(F.col("lon_max") / cell_deg).cast("long")
    iy0 = F.floor(F.col("lat_min") / cell_deg).cast("long")
    iy1 = F.floor(F.col("lat_max") / cell_deg).cast("long")
    return (
        df.withColumn("_ix0", ix0).withColumn("_iy0", iy0)
        .withColumn("ix", F.explode(F.sequence(ix0, ix1)))
        .withColumn("iy", F.explode(F.sequence(iy0, iy1)))
        .select(
            *[F.col(c).alias(f"{c}{tag}") for c in df.columns],
            F.col("_ix0").alias(f"_ix0{tag}"), F.col("_iy0").alias(f"_iy0{tag}"),
            "ix", "iy",
        )
    )


def _overlaps(a: str, b: str) -> Column:
    return (
        (F.col(f"lon_min{a}") <= F.col(f"lon_max{b}"))
        & (F.col(f"lon_min{b}") <= F.col(f"lon_max{a}"))
        & (F.col(f"lat_min{a}") <= F.col(f"lat_max{b}"))
        & (F.col(f"lat_min{b}") <= F.col(f"lat_max{a}"))
    )


def bbox_join(a: DataFrame, b: DataFrame, cell_deg: float = 8.0,
              id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """``a`` ⋈ ``b`` on rectangle overlap (closed envelopes, shared-edge
    touches count — same as SQL's ``BETWEEN``-style overlap predicate).

    Inputs carry an id column named ``id_a``/``id_b`` plus ``lon_min,
    lon_max, lat_min, lat_max``.  Output: one row per overlapping
    (id_a, id_b) pair — exact, no duplicates (canonical-cell dedup:
    each pair is claimed only by the cell containing the overlap
    region's min corner, so the equi-join's multiplicity never reaches
    the output and no distinct() shuffle is spent)."""
    ca = _cover(a.select(id_a, *BOX_COLS), cell_deg, "_a")
    cb = _cover(b.select(id_b, *BOX_COLS), cell_deg, "_b")
    cand = ca.join(cb, ["ix", "iy"])
    canonical = (
        (F.col("ix") == F.greatest("_ix0_a", "_ix0_b"))
        & (F.col("iy") == F.greatest("_iy0_a", "_iy0_b"))
    )
    return (
        cand.where(_overlaps("_a", "_b") & canonical)
        .select(F.col(f"{id_a}_a").alias(id_a), F.col(f"{id_b}_b").alias(id_b))
    )


def bbox_join_bruteforce(a: DataFrame, b: DataFrame,
                         id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Oracle-grade cross-join form (small inputs only)."""
    ca = a.select(F.col(id_a), *[F.col(c).alias(f"{c}_a") for c in BOX_COLS])
    cb = b.select(F.col(id_b), *[F.col(c).alias(f"{c}_b") for c in BOX_COLS])
    return ca.crossJoin(cb).where(_overlaps("_a", "_b")).select(id_a, id_b)

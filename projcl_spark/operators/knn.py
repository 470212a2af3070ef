"""k-nearest-neighbors by geodesic distance — cell-pruned (engine-added).

Replaces the reference's all-pairs distance matrix
(``pl_inverse_geodesic_s``, a 2-D NDRange cross product) with the
scale-correct plan: candidates are pruned to the query's cell ring before
any distance is computed, so the join is an equi-join on ``cell_id``
(shuffle-partitionable, AQE-skew-splittable) instead of a cross product.

Distance = haversine as a pure column expression (JVM codegen), or Vincenty
(pandas UDF) for ellipsoidal accuracy.  Top-k via window rank with a
deterministic (distance, id) tie-break — exact-match reproducible across
parallelism levels (north rule §4.2 determinism).

Correctness condition for ring pruning: the true k-th neighbor must lie
within ``ring`` cells of the query's cell.  Callers choose (res, ring) from
data density; ``knn_bruteforce`` is the oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import haversine_col, vincenty_udf
from ..index.cells import cell_id_col, ring_cells_col


def _dist(metric: str):
    if metric == "haversine":
        return lambda: haversine_col(F.col("q_lon"), F.col("q_lat"), F.col("lon"), F.col("lat"))
    if metric == "vincenty":
        udf = vincenty_udf()
        return lambda: udf(F.col("q_lon"), F.col("q_lat"), F.col("lon"), F.col("lat"))
    raise ValueError(f"unknown metric {metric!r}")


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    res: int = 6,
    ring: int = 1,
    metric: str = "haversine",
    query_id: str = "query_id",
    point_id: str = "doc_id",
) -> DataFrame:
    """queries(query_id, q_lon, q_lat) × points(point_id, lon, lat) → top-k.

    Plan shape: queries explode their cell ring (small multiplier,
    (2·ring+1)²) → equi-join points on cell_id → windowed top-k.  The big
    point side is scanned once and shuffled on cell_id only.
    """
    q = queries.withColumn(
        "cell_id", F.explode(ring_cells_col(cell_id_col(F.col("q_lon"), F.col("q_lat"), res), res, ring))
    )
    p = points.withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), res))
    cand = q.join(p, "cell_id", "inner").withColumn("dist_m", _dist(metric)())
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("cell_id")
    )


def knn_bruteforce(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    metric: str = "haversine",
    query_id: str = "query_id",
    point_id: str = "doc_id",
) -> DataFrame:
    """Exact kNN via cross join — the oracle twin (small inputs only)."""
    cand = queries.crossJoin(points).withColumn("dist_m", _dist(metric)())
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

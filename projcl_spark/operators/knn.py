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

from ..functions import EARTH_RADIUS_SPHERE, haversine_col, vincenty_udf
from ..index.cells import cell_id_col, cell_xy_col, ring_cells_col


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


R_SPHERE = EARTH_RADIUS_SPHERE  # authalic sphere radius — single source of truth


def _safe_radius_col(q_lon, q_lat, res: int, ring: int):
    """Conservative lower bound (meters) on the HAVERSINE distance from a
    query point to anything OUTSIDE its (2·ring+1)² cell window.

    Any geodesic leaving the window first crosses a lat edge — length
    ≥ R·Δφ (the meridional arc is the shortest curve changing latitude by
    Δφ) — or a lon edge segment inside the lat band.  For the lon edges we
    use the rigorous spherical bound: the haversine distance between points
    with longitude gap Δλ is ≥ 2R·asin(√(cos φq · cos φ*) · sin(Δλ/2)),
    where cos φ* is the MINIMUM cosine over the band (dropping the
    always-positive Δφ term of the haversine can only shrink it).  The
    previous linearized bound Δλ·R·cos φ* OVERestimated (asin ≤ its
    argument scaled), which could falsely certify an inexact result.

    Windows that TOUCH a map edge get safe radius 0 (→ the query always
    escalates to brute force): near a pole the closest outside point can
    lie ACROSS the pole, and at ±180° it can lie across the antimeridian
    wrap — neither is bounded by these edge distances, and an earlier
    "edge ⇒ no escape that way (∞)" treatment silently certified WRONG
    results there (it also drove cos through sqrt(negative)=NaN, which
    Spark's greatest/least clamp launders into an asin(1) bound).  At
    res ≥ 4 edge-adjacent queries are a vanishing fraction of the grid.
    """
    import math

    n = 1 << res
    w_lon, w_lat = 360.0 / n, 180.0 / n
    ix, iy = cell_xy_col(q_lon, q_lat, res)
    lon_lo = (ix - ring) * w_lon - 180.0
    lon_hi = (ix + ring + 1) * w_lon - 180.0
    lat_lo = (iy - ring) * w_lat - 90.0
    lat_hi = (iy + ring + 1) * w_lat - 90.0
    deg = math.pi / 180.0 * R_SPHERE
    # inside the edge guard |lat_lo|,|lat_hi| ≤ 90 → cosines ≥ 0, no NaN
    cos_min = F.least(
        F.cos(F.radians(F.greatest(F.abs(lat_lo), F.abs(lat_hi)))), F.cos(F.radians(q_lat))
    )

    def lon_edge(delta_deg):
        half = F.radians(delta_deg) / 2.0
        arg = F.sqrt(F.cos(F.radians(q_lat)) * cos_min) * F.sin(half)
        return 2.0 * R_SPHERE * F.asin(F.least(F.greatest(arg, F.lit(0.0)), F.lit(1.0)))

    touches_edge = (
        (lat_hi >= 90.0) | (lat_lo <= -90.0)
        | (lon_hi >= 180.0) | (lon_lo <= -180.0)
    )
    d_n = (lat_hi - q_lat) * deg
    d_s = (q_lat - lat_lo) * deg
    d_e = lon_edge(lon_hi - q_lon)
    d_w = lon_edge(q_lon - lon_lo)
    return F.when(touches_edge, F.lit(0.0)).otherwise(
        F.least(d_n, d_s, d_e, d_w)
    )


def knn_join_exact(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    res: int = 6,
    ring: int = 1,
    metric: str = "haversine",
    query_id: str = "query_id",
    point_id: str = "doc_id",
) -> DataFrame:
    """Exact kNN at any density: pruned pass + provable escalation.

    Runs the cell-pruned ``knn_join``; a query's result is accepted only if
    it found k candidates AND its k-th distance is strictly inside the
    window's safe radius (so nothing outside the window can beat it).
    The (few) unproven queries re-run against the full corpus.  At healthy
    (res, ring) for the data density the escalation set is empty and the
    extra cost is one tiny aggregate.

    Haversine only: the safe-radius certificate is a spherical bound, and
    an ellipsoidal (Vincenty) k-th distance cannot be compared against it
    soundly.
    """
    if metric != "haversine":
        raise ValueError("knn_join_exact certifies the haversine metric only")
    # top-k per query is tiny — persist so the expensive pruned plan runs
    # once, not once per downstream consumer (bad.count + good join)
    pruned = knn_join(queries, points, k, res, ring, metric, query_id, point_id).persist()
    per_q = pruned.groupBy(query_id).agg(
        F.max("dist_m").alias("_kth"), F.count("*").alias("_nf")
    )
    qx = queries.join(per_q, query_id, "left").withColumn(
        "_safe", _safe_radius_col(F.col("q_lon"), F.col("q_lat"), res, ring)
    )
    bad = qx.filter(
        F.col("_nf").isNull() | (F.col("_nf") < k) | (F.col("_kth") >= F.col("_safe"))
    ).select(queries.columns)
    bad_rows = bad.count()  # driver decision: escalation set is tiny by design
    good = pruned.join(
        bad.select(query_id), query_id, "left_anti"
    )
    # the cache served the certificate's dual consumption (per-query agg +
    # escalation count); release it now or every call leaks cached blocks
    # for the session's lifetime.  The returned plan recomputes the pruned
    # join at most once when the caller materializes it.
    pruned.unpersist(blocking=False)
    if bad_rows == 0:
        return good
    rescued = knn_bruteforce(bad, points, k, metric, query_id, point_id)
    return good.unionByName(rescued.select(good.columns))


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

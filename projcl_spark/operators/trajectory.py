"""Trajectory (track) statistics — engine-added.

Per-entity path aggregation over timestamped points: order each entity's
points by event time, measure consecutive geodesic hops (the reference's
spherical inverse geodesic, kernel/pl_geodesic.opencl:31-59, as a
JVM-codegen column), and reduce to per-track stats (hop count, total
meters, duration).  The reference computes distance matrices only; a
trajectory rollup is what fleet/mobility users actually derive from them.

Plan shape: ONE shuffle on the entity key (the lag window and the final
groupBy share the partitioning, so Catalyst reuses the exchange), then a
partial-aggregated reduce.  No joins, no cross products; state per task is
one window frame row.  Determinism: the window orders by (ts, id) — a
total order — so hop assignment is reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import haversine_col


def track_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_id: str | None = None,
) -> DataFrame:
    """Per-``key`` track stats: n_pts, n_hops, total geodesic meters,
    duration in seconds (last ts − first ts).

    ``order_id`` breaks timestamp ties deterministically (required for a
    reproducible hop sequence when two pings share a timestamp).
    """
    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    hop = haversine_col(
        F.lag(lon).over(w), F.lag(lat).over(w), F.col(lon), F.col(lat)
    )
    seg = df.withColumn(
        "_hop_m", F.when(F.lag(lon).over(w).isNull(), F.lit(0.0)).otherwise(hop)
    )
    return seg.groupBy(key).agg(
        F.count("*").alias("n_pts"),
        (F.count("*") - 1).cast("long").alias("n_hops"),
        F.sum("_hop_m").alias("track_m"),
        (F.unix_micros(F.max(ts).cast("timestamp"))
         - F.unix_micros(F.min(ts).cast("timestamp"))).alias("duration_us"),
    )

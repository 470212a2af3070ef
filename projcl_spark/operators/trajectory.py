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


def track_bearing_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_id: str | None = None,
) -> DataFrame:
    """Per-``key`` circular heading statistics: hop count, circular-mean
    bearing (degrees), and mean resultant length R ∈ [0, 1] (1 = all
    hops share a heading, → 0 = uniformly scattered — directional
    statistics' standard dispersion measure).

    The hop bearing is the initial great-circle azimuth
    (``oracle.bearing_deg`` — ONE text for the codegen column and the
    DuckDB twin); the circular mean is atan2(Σ sin θ, Σ cos θ), which a
    linear mean of angles gets wrong across the ±180° cut.  Same
    single-exchange shape as ``track_stats``.

    Conditioning: the atan2 direction is ill-posed only when the
    resultant ‖(Σs, Σc)‖ ≈ 0; for n random-ish hops that norm
    concentrates near √(n/2) (Rayleigh), so the probability of falling
    within float-noise of 0 is ~(noise)² — negligible, and R itself
    (what callers should gate on) is always well-defined.
    """
    from .. import oracle as O

    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    seg = (
        df.select(
            key,
            F.col(ts),
            *([F.col(order_id)] if order_id else []),
            F.lag(lon).over(w).alias("_plon"),
            F.lag(lat).over(w).alias("_plat"),
            F.col(lon).alias("_lon"),
            F.col(lat).alias("_lat"),
        )
        .filter(F.col("_plon").isNotNull())
    )
    b = F.expr(O.bearing_deg("_plon", "_plat", "_lon", "_lat"))
    hops = seg.select(
        key,
        F.sin(F.radians(b)).alias("_s"),
        F.cos(F.radians(b)).alias("_c"),
    )
    agg = hops.groupBy(key).agg(
        F.count("*").alias("n_hops"),
        F.sum("_s").alias("_ss"),
        F.sum("_c").alias("_sc"),
    )
    return agg.select(
        key,
        "n_hops",
        F.degrees(F.atan2(F.col("_ss"), F.col("_sc"))).alias("mean_bearing_deg"),
        (F.sqrt(F.col("_ss") ** 2 + F.col("_sc") ** 2)
         / F.col("n_hops")).alias("resultant_r"),
    )

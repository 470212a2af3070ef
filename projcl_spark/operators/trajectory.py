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


def track_resample(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_id: str | None = None,
    step_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """Resample each entity's track onto a fixed time grid (every
    ``step_us``), positions interpolated ALONG THE GREAT CIRCLE between
    the bracketing pings (``oracle.slerp_lonlat`` — one text for the
    codegen column and the DuckDB twin; linear lon/lat interpolation
    would cut corners on long hops and break at the antimeridian).

    Grid instants covered by segment (t_i, t_{i+1}] are generated
    in-task (``sequence`` + ``explode`` — zero shuffle beyond the one
    lag-window exchange; fan-out per segment ≈ gap/step).  Each grid
    time is emitted exactly once: the half-open assignment means a grid
    point equal to a ping time belongs to the segment ENDING there, and
    a grid point before the first ping or equal to it is not emitted.
    Zero-length segments (timestamp ties) generate an empty range, so
    the interpolation fraction never divides by zero.

    Returns (key, t_us, lon, lat) with f ∈ (0, 1] by construction.
    """
    from .. import oracle as O

    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    seg = (
        df.select(
            key,
            F.col(ts),
            *([F.col(order_id)] if order_id else []),
            us.alias("_us"),
            F.col(lon).alias("_lon"),
            F.col(lat).alias("_lat"),
        )
        .withColumns(
            {
                "_nus": F.lead("_us").over(w),
                "_nlon": F.lead(F.col("_lon")).over(w),
                "_nlat": F.lead(F.col("_lat")).over(w),
            }
        )
        .filter(F.col("_nus").isNotNull() & (F.col("_nus") > F.col("_us")))
    )
    a = (F.floor(F.col("_us") / F.lit(step_us)) + 1).cast("long")
    b = F.floor(F.col("_nus") / F.lit(step_us)).cast("long")
    grid = seg.withColumn(
        "_k",
        F.explode(
            F.when(a <= b, F.sequence(a, b)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    frac = (f"(CAST(_k AS DOUBLE) * {step_us} - CAST(_us AS DOUBLE))"
            f" / (CAST(_nus AS DOUBLE) - CAST(_us AS DOUBLE))")
    lon_e, lat_e = O.slerp_lonlat("_lon", "_lat", "_nlon", "_nlat", frac)
    return grid.select(
        key,
        (F.col("_k") * step_us).alias("t_us"),
        F.expr(lon_e).alias("lon"),
        F.expr(lat_e).alias("lat"),
    )


def simplify_vw(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lon_e6: str = "x_e6",
    lat_e6: str = "y_e6",
    order_id: str | None = None,
    min_area2: int = 0,
) -> DataFrame:
    """One-pass Visvalingam–Whyatt track simplification: drop interior
    points whose effective-area triangle (previous, this, next) is below
    ``min_area2`` — engine-added (map rendering / tile export thins dense
    GPS tracks before styling; the reference projects points but has no
    polyline simplifier).

    Coordinates come in as INTEGER micro-degrees, and the doubled
    triangle area ``|（x1−x0)(y2−y0) − (x2−x0)(y1−y0)|`` is computed in
    pure BIGINT arithmetic — exact end-to-end, no float tie can flip a
    keep decision across engines or parallelism levels.  Endpoints
    (lag/lead NULL) are always kept, with ``area2`` reported as −1.

    Plan shape: ONE shuffle on the track key; both window functions ride
    the same (key, ts, id)-ordered exchange; the filter is codegen.  This
    is the single-pass effective-area variant (each point scored against
    its ORIGINAL neighbors): at constant memory per window row it
    streams any track length, where the classic iterative VW would need
    per-track state proportional to the polyline.
    """
    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    x0, y0 = F.lag(lon_e6).over(w), F.lag(lat_e6).over(w)
    x2, y2 = F.lead(lon_e6).over(w), F.lead(lat_e6).over(w)
    area2 = F.abs(
        (F.col(lon_e6) - x0) * (y2 - y0) - (x2 - x0) * (F.col(lat_e6) - y0)
    )
    return (
        df.withColumn("area2", F.coalesce(area2, F.lit(-1)).cast("long"))
        .where((F.col("area2") < 0) | (F.col("area2") >= min_area2))
    )


def od_matrix(
    df: DataFrame,
    res: int = 3,
    key: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_id: str | None = None,
) -> DataFrame:
    """Origin-destination matrix: each entity contributes one flow from
    the cell of its FIRST ping to the cell of its LAST ping (total
    (ts, id) order — reproducible); flows are counted per (origin, dest)
    cell pair at ``res``.

    Two map-side-combinable aggregates: per-key endpoints via min/max on
    (us, cell) structs — NOT a window + distinct — then the flow count.
    The struct trick keeps it one exchange per aggregate with partial
    combine; at 100 TB the second agg's input is one row per entity.
    """
    from ..index.cells import cell_id_col

    us = F.unix_micros(F.col(ts).cast("timestamp"))
    okey = F.struct(
        us.alias("us"),
        *([F.col(order_id).alias("oid")] if order_id else []),
        cell_id_col(F.col(lon), F.col(lat), res).alias("cell"),
    )
    ends = df.select(key, okey.alias("_k")).groupBy(key).agg(
        F.min("_k").alias("_first"), F.max("_k").alias("_last")
    )
    return (
        ends.select(
            F.col("_first.cell").alias("o_cell"),
            F.col("_last.cell").alias("d_cell"),
        )
        .groupBy("o_cell", "d_cell")
        .agg(F.count("*").alias("n_flows"))
    )


def staypoints(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    order_id: str | None = None,
    radius_m: float = 200.0,
    max_gap_us: int = 6 * 3600 * 1_000_000,
    min_pings: int = 2,
) -> DataFrame:
    """Stay-point (dwell) detection: maximal runs of consecutive pings
    where every hop is shorter than ``radius_m`` AND every time gap is
    below ``max_gap_us``; runs with ≥ ``min_pings`` pings are emitted as
    (key, start_us, end_us, n_pings, duration_us, centroid lon/lat).

    The windowed formulation (a hop/gap threshold starts a new run; run
    id = running count of starts) is deliberately chosen over the
    classic greedy anchor scan: it is expressible as lag + running-sum
    windows sharing ONE entity-key exchange with the final aggregate —
    no iteration, no state beyond a window frame — and the SQL twin is
    the identical pair of window passes, so the run assignment is
    bit-reproducible cross-engine (the hop comparison sees the same
    doubles: ``functions.haversine_col`` and the oracle share one
    formula text).
    """
    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    hop = haversine_col(
        F.lag(lon).over(w), F.lag(lat).over(w), F.col(lon), F.col(lat)
    )
    seg = df.select(
        key,
        F.col(ts),
        *([F.col(order_id)] if order_id else []),
        us.alias("_us"),
        F.col(lon),
        F.col(lat),
    ).withColumn(
        "_new",
        F.when(
            F.lag("_us").over(w).isNull()
            | (hop >= F.lit(radius_m))
            | ((F.col("_us") - F.lag("_us").over(w)) >= F.lit(max_gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = seg.withColumn(
        "_run",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    out = runs.groupBy(key, "_run").agg(
        F.count("*").alias("n_pings"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        F.avg(lon).alias("center_lon"),
        F.avg(lat).alias("center_lat"),
    )
    return out.where(F.col("n_pings") >= min_pings).select(
        key, "start_us", "end_us", "n_pings",
        (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        "center_lon", "center_lat",
    )


def geofence_transitions(
    df: DataFrame,
    polygons: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str | None = None,
    res: int = 8,
) -> DataFrame:
    """Geofence enter/exit events: per entity, emit a row whenever the
    inside-any-polygon state CHANGES between consecutive pings.

    Two-stage plan that keeps the corpus un-joined: (1) the zero-shuffle
    ``pip.pip_inside_flag`` closure map stamps every ping with the
    boolean (the polygon layer rides the UDF closure exactly as in
    ``pip_join``); (2) one lag window on the entity key compares
    consecutive states.  Total: ONE exchange, on the entity key.  The
    first ping of an entity is never a transition (no prior state).

    Returns (key, t_us, direction) with direction ∈ {'enter', 'exit'}.
    """
    from .pip import pip_inside_flag

    flagged = pip_inside_flag(df, polygons, res=res)
    order = [F.col(ts).asc()] + ([F.col(order_id).asc()] if order_id else [])
    w = Window.partitionBy(key).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    seq = flagged.select(
        key,
        F.col(ts),
        *([F.col(order_id)] if order_id else []),
        us.alias("t_us"),
        F.col("inside"),
    ).withColumn("_prev", F.lag("inside").over(w))
    return (
        seq.where(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("inside")))
        .select(
            key, "t_us",
            F.when(F.col("inside"), F.lit("enter")).otherwise(F.lit("exit"))
            .alias("direction"),
        )
    )


def track_hausdorff(
    df: DataFrame,
    key: str = "user_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Discrete (symmetric) Hausdorff distance between every pair of
    entity tracks: max over one track's points of the min haversine to
    the other, both directions, in meters.

    Plan: per-entity coordinate ARRAYS via one collect_list aggregate
    (arrays are entity-sized; the operator contract is a SAMPLED entity
    set — all-pairs over 10^9 entities is the caller's mistake, and the
    pair join below would make it visible as an explicit cross), then
    an (a.key < b.key) pair join and ONE Arrow-batched pandas UDF
    computing the blocked distance matrix per pair.  min/max over a
    fixed multiset of doubles are order-independent, so the collect_list
    ordering (nondeterministic under parallelism) does NOT leak into
    the result; the numpy haversine mirrors ``oracle.haversine``'s
    operation order and the output is quantized by callers (10 m —
    ~9 orders above the ≤1-ulp libm spread between numpy and the
    engines).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    # materialize the per-entity arrays ONCE (lazy checkpoint): the pair
    # join consumes `tracks` on both sides, and without this the corpus
    # scan + coordinate derivation upstream execute twice.  The table is
    # entity-sized (sampled), so the checkpoint is cheap.
    tracks = df.groupBy(key).agg(
        F.collect_list(lon).alias("xs"), F.collect_list(lat).alias("ys")
    ).localCheckpoint(eager=False)
    a = tracks.select(F.col(key).alias("ka"), F.col("xs").alias("xa"),
                      F.col("ys").alias("ya"))
    b = tracks.select(F.col(key).alias("kb"), F.col("xs").alias("xb"),
                      F.col("ys").alias("yb"))
    R = 6370997.0

    # no type hints: pd is function-local, so hint resolution would fail
    # under `from __future__ import annotations`; hint-less pandas_udf
    # defaults to the scalar Arrow batch signature we want
    @F.pandas_udf(DoubleType())
    def hd(xa, ya, xb, yb):
        out = np.empty(len(xa))
        for i in range(len(xa)):
            lo1 = np.radians(np.asarray(xa[i], dtype=np.float64))[:, None]
            la1 = np.radians(np.asarray(ya[i], dtype=np.float64))[:, None]
            lo2 = np.radians(np.asarray(xb[i], dtype=np.float64))[None, :]
            la2 = np.radians(np.asarray(yb[i], dtype=np.float64))[None, :]
            h = (np.sin((la2 - la1) / 2) ** 2
                 + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2)
            d = 2.0 * R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))
            out[i] = max(d.min(axis=1).max(), d.min(axis=0).max())
        return pd.Series(out)

    return (
        a.join(b, F.col("ka") < F.col("kb"))
        .select("ka", "kb", hd("xa", "ya", "xb", "yb").alias("hausdorff_m"))
    )


def polyline_encode(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Google encoded-polyline per track — the interchange STRING format
    web maps consume (the vector counterpart of the MVT quantization in
    ``q_mvt_quantize``; engine-added, the reference emits raw meters).

    Standard algorithm: 1e-5° quantization, per-point (lat, lon) deltas
    against the previous point, zigzag, 5-bit base-32 continuation chunks
    + 63 (``oracle.polyline_q5_sql`` / ``polyline_zigzag_sql`` /
    ``polyline_chunks_sql`` — the SAME text the DuckDB oracle runs).  All
    delta/chunk math is exact BIGINT, so the output string is
    bit-reproducible across engines and parallelism levels.

    Plan shape: ONE shuffle on the track key (lag window + groupBy share
    it); per-point chunk emission is whole-stage codegen; assembly is an
    ordered in-group concat (collect_list of one small string per point
    — bounded by track length, the same envelope every per-track op
    here carries).
    """
    from .. import oracle as O

    pts = df.select(
        key, ts, order_id,
        F.expr(O.polyline_q5_sql(lat)).alias("lat5"),
        F.expr(O.polyline_q5_sql(lon)).alias("lon5"),
    )
    w = Window.partitionBy(key).orderBy(ts, order_id)
    d = (pts
         .withColumn("dlat", F.col("lat5")
                     - F.coalesce(F.lag("lat5").over(w), F.lit(0)))
         .withColumn("dlon", F.col("lon5")
                     - F.coalesce(F.lag("lon5").over(w), F.lit(0)))
         .withColumn("vlat", F.expr(O.polyline_zigzag_sql("dlat")))
         .withColumn("vlon", F.expr(O.polyline_zigzag_sql("dlon"))))
    d = d.withColumn("enc", F.concat(
        F.expr(O.polyline_chunks_sql("vlat", "spark")),
        F.expr(O.polyline_chunks_sql("vlon", "spark"))))
    return d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_pts"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(ts, order_id, "enc"))),
                lambda x: x["enc"]),
            "").alias("polyline"),
    )

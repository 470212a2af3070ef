"""Structured Streaming operators (engine-added; the reference is strictly
batch — SURVEY.md §2 Table B "Streaming: none").

Two shapes a geo/event pipeline needs:

- ``stream_cell_counts``: file-source stream → derive (cell, window) →
  watermark + tumbling-window count.  At scale this is the live tile-
  heatmap path; watermark bounds state, cells shard the aggregation.
- ``sessionize``: custom stateful operator via ``applyInPandasWithState``
  — per-user sessions split on inactivity gaps (the pattern for any
  bespoke streaming state the built-ins can't express).

Tests drive both with ``trigger(availableNow=True)`` over parquet inputs
and compare against the equivalent batch computation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

from ..index.cells import cell_id_col
from ..oracle import derived_lonlat


def event_points(df: DataFrame) -> DataFrame:
    """events(event_id, ts, …) → (event_id, ts, lon, lat, cell_id) with the
    engine's deterministic geo derivation (same formula as the batch side)."""
    lon_e, lat_e = derived_lonlat("'events:' || CAST(event_id AS STRING)", "spark")
    out = df.select(
        "event_id",
        # testdata timestamps are TIMESTAMP_NTZ; watermarks need TIMESTAMP
        F.col("ts").cast("timestamp").alias("ts"),
        F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat"),
    )
    return out.withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), 6))


def stream_cell_counts(
    stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window per-cell event counts with late-data handling."""
    pts = event_points(stream)
    return (
        pts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "cell_id")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "cell_id", "n")
    )


def stream_pip(stream: DataFrame, polygons: DataFrame, res: int = 6) -> DataFrame:
    """Stream-static PIP enrichment — live tile/polygon assignment: each
    incoming event derives (lon, lat), equi-joins the BROADCAST polygon
    cell cover, and passes the exact winding refine (the same
    ``operators.pip.pip_join`` plan the batch side runs; Structured
    Streaming allows static broadcast joins and pandas-UDF filters in a
    stream).  STATELESS — no watermark, no state store: availableNow
    append output equals the batch join row-for-row, which is what makes
    the gate query value-checkable against the batch oracle.  At scale
    this is the \"project → cell-encode → join against polygon layers\"
    north-star path running on a live feed."""
    from ..operators.pip import pip_join

    pts = event_points(stream)
    return pip_join(pts, polygons, res=res).select("event_id", "poly_id")


def stream_interval_join(stream: DataFrame, horizon_s: int = 300,
                         watermark: str = "10 minutes") -> DataFrame:
    """Watermarked STREAM-STREAM self-join: pairs of events from the same
    user within ``horizon_s`` seconds ((a, b) with a_id < b_id and
    b_ts ∈ [a_ts, a_ts + horizon]).  The event-time range condition is on
    the raw timestamp columns — that is what lets Spark bound each side's
    join state by the watermark instead of keeping every row forever (the
    only stream-stream join shape that survives an unbounded feed).

    Determinism note (same precondition as ``stream_dedup``): an INNER
    stream-stream join emits every match whose partner is still in state;
    with each side drained in ONE availableNow micro-batch no state is
    evicted mid-run, so the emitted set equals the batch interval join —
    the value-checkable drain.  Multi-batch runs can only miss pairs
    separated by more than the watermark, which is correct
    join-within-horizon semantics."""
    a = stream.select(
        "user_id", F.col("event_id").alias("a_id"),
        F.col("ts").cast("timestamp").alias("a_ts"),
    ).withWatermark("a_ts", watermark)
    b = stream.select(
        F.col("user_id").alias("b_user"), F.col("event_id").alias("b_id"),
        F.col("ts").cast("timestamp").alias("b_ts"),
    ).withWatermark("b_ts", watermark)
    return a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("a_id") < F.col("b_id"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {horizon_s} SECONDS")),
        "inner",
    ).select("user_id", "a_id", "b_id")


DEDUP_BUCKETS = 50


def stream_dedup(stream: DataFrame, buckets: int = DEDUP_BUCKETS,
                 watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup — the at-least-once-ingestion twin of the
    batch ``dedup_exact``: drop replayed rows by content key within the
    watermark horizon (``dropDuplicatesWithinWatermark``, so state is
    BOUNDED by the watermark instead of growing forever — the only shape
    that survives an unbounded stream).

    The content key here is (user_id, event_id % buckets): the modulus
    manufactures genuine collisions in the synthetic feed, standing in for
    a payload hash.  Only the KEY columns are emitted — the surviving
    row's other fields depend on arrival order, the key set does not.

    Determinism note (same precondition as ``sessionize``): with the
    whole input in one availableNow micro-batch, no key's state can
    expire mid-run, so the output is exactly one row per distinct key.
    Across multiple micro-batches a key re-arriving after its state
    expired re-emits — correct dedup-within-horizon semantics, but only
    the single-batch drain is value-oracle-checkable."""
    keyed = stream.select(
        "user_id",
        (F.col("event_id") % buckets).cast("long").alias("bucket"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return keyed.dropDuplicatesWithinWatermark(["user_id", "bucket"]).select(
        "user_id", "bucket"
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("status", StringType()),
])

# epochs in integer MICROSECONDS carried in doubles (exact below 2^53)
_STATE_SCHEMA = "start_us double, last_us double, n long"
GAP_SECONDS = 1800.0
# Event-time watermark for the sessionize stream: sessions time out when
# the watermark (max event time − this delay) passes last_ts + GAP.
SESSION_WATERMARK = "10 minutes"
SESSION_WATERMARK_MS = 600_000


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session assembly: a session closes after a 30-min gap (or
    on state timeout).  Emits closed sessions; the open one stays in state.

    ALL arithmetic is integer MICROSECONDS (stored in the double state
    columns, where µs epochs < 2^53 are exact): float-second epochs differ
    in the last ulp between engines (pandas divides ns, DuckDB divides
    µs), which could flip a gap test whose true value is exactly GAP —
    integer µs make every split/timeout decision oracle-replicable."""
    (user_id,) = key
    gap_us = int(GAP_SECONDS * 1e6)

    def _emit(rows, status):
        yield pd.DataFrame({
            "user_id": [user_id] * len(rows),
            "session_start": [pd.Timestamp(int(s), unit="us") for s, _, _ in rows],
            "session_end": [pd.Timestamp(int(e), unit="us") for _, e, _ in rows],
            "n_events": [n_ for _, _, n_ in rows],
            "status": [status] * len(rows),
        })

    if state.hasTimedOut:
        row = state.get
        state.remove()
        yield from _emit([row], "timeout")
        return

    ts = sorted(
        int(u) for pdf in pdfs
        for u in pd.to_datetime(pdf["ts"]).astype("int64") // 1000
    )
    if state.exists:
        start_us, last_us, n = (int(v) for v in state.get)
    else:
        start_us, last_us, n = ts[0], ts[0], 0

    closed = []
    for t in ts:
        if t - last_us > gap_us:
            closed.append((start_us, last_us, n))
            start_us, n = t, 0
        last_us = t
        n += 1
    state.update((float(start_us), float(last_us), n))
    # Event-time timeout in EXACT integer ms (floor of the µs event time,
    # matching Spark's ms-floored watermark):
    #   fires iff  last_us//1000 + GAP_ms  <  max_us//1000 − delay_ms
    state.setTimeoutTimestamp(last_us // 1000 + int(GAP_SECONDS * 1000))
    if closed:
        yield from _emit(closed, "closed")


def sessionize(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user inactivity sessions via
    ``applyInPandasWithState`` (Arrow-batched state machine, no per-row
    Python beyond the grouped batches).

    EVENT-time timeout, not processing time: a wall-clock timeout makes an
    ``availableNow`` drain spin "no new data but cleaning up state"
    micro-batches for the full gap (30 real minutes) before it can
    terminate, and which sessions get flushed depends on when the run
    happens.  With an event-time timeout the watermark is data-derived, so
    the emitted set is deterministic and the drain terminates as soon as
    the final watermark is processed — the behavior a 100-TB backfill
    replay needs."""
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .withWatermark("ts", SESSION_WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(df: DataFrame) -> DataFrame:
    """Batch twin of ``sessionize`` (closed sessions only) for tests:
    lag-gap window → session ids → per-session aggregates."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    ts = F.col("ts").cast("timestamp")
    gaps = df.select("user_id", ts.alias("ts")).withColumn(
        "new_session",
        # integer-µs gap, same arithmetic as _sessionize_fn (whole-second
        # unix_timestamp would misjudge sub-second gap boundaries)
        (F.unix_micros(ts) - F.unix_micros(F.lag("ts").over(w))
         > int(GAP_SECONDS * 1e6)).cast("int"),
    ).withColumn(
        "session_no",
        F.sum(F.coalesce("new_session", F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return gaps.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


GEOFENCE_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("t_us", LongType()),
    StructField("direction", StringType()),
])

# last inside/outside flag per entity; last event µs carried so a later
# micro-batch continues from the right boundary state
_GEOFENCE_STATE = "last_inside boolean, last_us double"


def _geofence_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-entity geofence state machine: emit a row whenever the
    inside-flag CHANGES between consecutive pings (batch rows sorted by
    (t_us, event_id) — the same total order as the batch operator).  The
    boundary state (last flag) persists across micro-batches, so a
    transition straddling two batches is emitted exactly once, by the
    batch that observes the flip.  No timeout: fence state is two scalars
    per entity and never expires on its own."""
    (user_id,) = key
    df = pd.concat(list(pdfs)).sort_values(["t_us", "event_id"])
    if state.exists:
        prev_inside, _ = state.get
        prev = bool(prev_inside)
    else:
        prev = None
    t_out, d_out = [], []
    last_t = 0.0
    for t, ins in zip(df["t_us"].to_numpy(), df["inside"].to_numpy()):
        ins = bool(ins)
        if prev is not None and ins != prev:
            t_out.append(int(t))
            d_out.append("enter" if ins else "exit")
        prev = ins
        last_t = float(t)
    if prev is not None:
        state.update((prev, last_t))
    yield pd.DataFrame({
        "user_id": [user_id] * len(t_out),
        "t_us": pd.Series(t_out, dtype="int64"),
        "direction": d_out,
    })


def stream_geofence(stream: DataFrame, polygons: DataFrame,
                    res: int = 7) -> DataFrame:
    """Streaming geofence enter/exit detection — the live twin of
    ``operators.trajectory.geofence_transitions``: a STATELESS
    inside-flag map (the inverted broadcast cover closure,
    ``pip.pip_inside_flag`` — zero joins on the stream side) feeds a
    per-entity ``applyInPandasWithState`` flip detector whose state is
    two scalars per entity.  With a single availableNow micro-batch the
    emitted set equals the batch operator row-for-row (the gate query's
    value oracle); across batches the boundary state makes each
    transition fire exactly once."""
    from ..operators.pip import pip_inside_flag

    lon_e, lat_e = derived_lonlat("'events:' || CAST(event_id AS STRING)",
                                  "spark")
    pts = stream.select(
        "user_id", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat"),
    )
    flagged = pip_inside_flag(pts, polygons, res=res).select(
        "user_id", "event_id", "t_us", "inside")
    return flagged.groupBy("user_id").applyInPandasWithState(
        _geofence_fn,
        outputStructType=GEOFENCE_SCHEMA,
        stateStructType=_GEOFENCE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Temporal / hypertable operators: batch sessionization, time-bucket
rollup + re-aggregation, and gap-filled (LOCF) bucket series.

The reference has no time axis at all; a production analytics engine
lives on one.  These are the TimescaleDB-style hypertable classics
re-expressed Spark-first:

- ``sessionize`` — the batch twin of ``streaming.ops.stream_sessions``:
  gap-threshold session assignment via ONE user-partitioned window
  (lag → gap flag → running sum) followed by a per-session aggregate
  that REUSES the window's hash partitioning (HashPartitioning(user)
  satisfies the (user, session) clustering — no second exchange; the
  same single-exchange discipline as ``trajectory.track_stats``).
- ``time_rollup`` / ``rollup_coarsen`` — continuous-aggregate semantics:
  the fine rollup is a map-side-combinable groupBy on integer bucket
  ids; the coarse level re-aggregates the FINE rollup (sum-of-sums,
  sum-of-counts, max-of-maxes), never the raw table — the hypertable
  invariant that makes continuous aggregates cheap at 100 TB.
- ``time_bucket_gapfill`` — dense per-key bucket spine (sequence +
  explode off the observed min/max — no driver-side ranges) left-joined
  to the observed rollup, missing buckets filled by last-observation-
  carried-forward (``last(ignorenulls)`` running window).

Determinism: ALL arithmetic is integer epoch-µs and per-row-integerized
values (CLAUDE.md time rule) — sums are exact at any parallelism, so the
outputs are bit-reproducible and need no quantization.

Scale shape: the only exchange touching raw rows is the first bucket
aggregate (map-side combined); everything after moves pre-aggregated
bucket rows, O(keys × span/bucket) ≪ corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_us(ts: str) -> F.Column:
    return F.unix_micros(F.col(ts).cast("timestamp"))


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_id: str = "event_id",
    gap_us: int = 6 * 3600 * 1_000_000,
) -> DataFrame:
    """Assign gap-threshold sessions and aggregate one row per session.

    Returns (key, session_idx, n_events, start_us, end_us, dur_us) with
    ``session_idx`` the 1-based per-key session ordinal.  A new session
    starts when the gap since the previous event is > ``gap_us``.
    ``order_id`` breaks timestamp ties so the lag sequence (and thus the
    whole result) is reproducible at any parallelism; tied rows have gap
    0 and can never split a session, so the tie order affects nothing
    observable.
    """
    us = _ts_us(ts)
    w = Window.partitionBy(key).orderBy(F.col("_us").asc(), F.col(order_id).asc())
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    rows = (
        df.select(key, order_id, us.alias("_us"))
        .withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
        .withColumn(
            "_new",
            F.when(F.col("_gap").isNull() | (F.col("_gap") > gap_us), 1).otherwise(0),
        )
        .withColumn("session_idx", F.sum("_new").over(run))
    )
    return rows.groupBy(key, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("dur_us"),
    )


def time_rollup(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_type",),
    ts: str = "ts",
    val: str = "value",
    bucket_us: int = 3600 * 1_000_000,
) -> DataFrame:
    """Fine-grained bucket rollup: (keys…, bucket, n, sum_e6, max_e6).

    ``bucket`` is the integer epoch-µs bucket ordinal (floor division —
    exact); ``val`` is integerized per row (×1e6, round-half-up) BEFORE
    summing so the aggregate is exact integer math.
    """
    v = F.round(F.col(val) * 1_000_000.0, 0).cast("long")
    b = F.floor(_ts_us(ts) / F.lit(bucket_us)).cast("long")
    return (
        df.select(*keys, b.alias("bucket"), v.alias("_v"))
        .groupBy(*keys, "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum("_v").alias("sum_e6"),
            F.max("_v").alias("max_e6"),
        )
    )


def rollup_coarsen(fine: DataFrame, factor: int,
                   keys: tuple[str, ...] = ("event_type",)) -> DataFrame:
    """Re-aggregate a ``time_rollup`` result to buckets ``factor``×
    coarser — from the FINE rollup only (sum-of-sums / sum-of-counts /
    max-of-maxes), never the raw table."""
    cb = F.floor(F.col("bucket") / F.lit(factor)).cast("long")
    return (
        fine.select(*keys, cb.alias("bucket"), "n", "sum_e6", "max_e6")
        .groupBy(*keys, "bucket")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_e6").alias("sum_e6"),
            F.max("max_e6").alias("max_e6"),
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    bin_us: int = 7 * 86400 * 1_000_000,
) -> DataFrame:
    """Temporal range-overlap join: rows (l, r) with
    [l_start, l_end] ∩ [r_start, r_end] ≠ ∅ (closed intervals,
    integer µs).

    Scale shape (the point): candidates come from an EQUI-join on
    covering time bins (``sequence`` + ``explode`` per interval — fan-out
    ≈ interval_len/bin + 1), never a raw range join, which Spark would
    execute as a broadcast-nested-loop at corpus scale.  A pair whose
    overlap spans k bins would surface k times, so each pair is emitted
    only in its CANONICAL bin — the bin of ``greatest(l_start, r_start)``
    which lies inside both intervals' covers whenever they overlap: dedup
    is a closed-form filter on the joined row, zero extra shuffle, no
    distinct (same discipline as ``geometry.segment_intersect_join``).
    ``bin_us`` is the knob: bins comparable to typical interval length
    keep both the fan-out and the per-bin population O(1)-ish.  Column
    names must be disjoint across the two inputs.
    """
    def bins(s: str, e: str) -> F.Column:
        return F.explode(
            F.sequence(
                F.floor(F.col(s) / F.lit(bin_us)).cast("long"),
                F.floor(F.col(e) / F.lit(bin_us)).cast("long"),
            )
        )

    lb = left.withColumn("_bin", bins(l_start, l_end))
    rb = right.withColumn("_bin", bins(r_start, r_end))
    canonical = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bin_us)
    ).cast("long")
    return (
        lb.join(rb, "_bin")
        .filter((F.col(l_start) <= F.col(r_end)) & (F.col(r_start) <= F.col(l_end)))
        .filter(F.col("_bin") == canonical)
        .drop("_bin")
    )


def time_bucket_gapfill(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    bucket_us: int = 86400 * 1_000_000,
) -> DataFrame:
    """Dense per-key bucket series with LOCF fill.

    Returns (key, bucket, n, sum_e6, filled_e6, is_gap): one row for
    EVERY bucket between the key's first and last observation.  ``n`` is
    0 and ``sum_e6`` null on generated buckets; ``filled_e6`` carries the
    last observed ``sum_e6`` forward (never null — the first bucket of a
    key is always observed by construction).

    The bucket spine is built per-key from the observed rollup's own
    min/max via ``sequence`` + ``explode`` — no driver-side ranges, no
    global spine; a key's fan-out is bounded by its own activity span.
    """
    obs = (
        df.select(
            key,
            F.floor(_ts_us(ts) / F.lit(bucket_us)).cast("long").alias("bucket"),
            F.round(F.col(val) * 1_000_000.0, 0).cast("long").alias("_v"),
        )
        .groupBy(key, "bucket")
        .agg(F.count("*").alias("n"), F.sum("_v").alias("sum_e6"))
        # obs feeds both the spine (min/max) and the join; without
        # materialization Spark inlines it and scans the RAW table twice.
        # obs is O(keys × active buckets) — tiny next to the corpus.
        .localCheckpoint()
    )
    spine = (
        obs.groupBy(key)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(key, F.explode(F.sequence("_lo", "_hi")).alias("bucket"))
    )
    dense = spine.join(obs, on=[key, "bucket"], how="left")
    run = Window.partitionBy(key).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dense.select(
        key,
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        "sum_e6",
        F.last("sum_e6", ignorenulls=True).over(run).alias("filled_e6"),
        F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_gap"),
    )

"""As-of (temporal nearest) join — engine-added relational operator.

For every left row, attach the single right row with the greatest
``right_ts <= left_ts`` (direction="backward"; "forward" mirrors) sharing
the join key.  The reference has no temporal operators at all; a
training-data pipeline needs this constantly (latest model score / config
/ session state as of each event).

Plan shape — the scale-correct union-window form, NOT a range join:
tag both sides, union on (key, ts), one shuffle on the key, then a
running ``last(payload, ignorenulls)`` window picks each left row's
predecessor in a single sorted pass.  Cost is one exchange + one
per-partition sort; a range-join formulation would be O(|L|·|R|) per key.
Skewed keys put one key in one task — at 100 TB, salt upstream or bucket
by (key, coarse time) first; the window itself never re-shuffles.

Determinism (north-rule reproducibility): ties on ``right_ts`` break by
the largest ``right_id``, totally ordering the pick at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_us: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left-outer as-of join: left columns + prefixed right payload
    (null where no qualifying right row exists).

    ``on`` is the equi-key, ``right_id`` the deterministic tie-break
    column on the right side.  ``tolerance_us`` (microseconds) nulls out
    matches farther than the tolerance from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    pay_cols = [c for c in right.columns if c != on]
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}"
                                 for c in pay_cols) + ">"
        ).alias("_r"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_src"),
        F.col(right_id).cast("long").alias("_tie"),
        F.lit(None).cast(l2.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in pay_cols]).alias("_r"),
    )
    u = l2.unionByName(r2)
    if direction == "backward":
        # right rows sort BEFORE the left rows of the same timestamp
        # (equal ts matches), ties by ascending id so last() = max id
        w = Window.partitionBy("_k").orderBy(
            F.col("_ts").asc(), F.col("_src").asc(), F.col("_tie").asc_nulls_last()
        )
    else:
        # forward: earliest right row with ts >= left ts; reverse the scan
        # so "last seen" = nearest following.  Ties sort ASCENDING here too:
        # last() lands on the max id, same tie-break as backward
        w = Window.partitionBy("_k").orderBy(
            F.col("_ts").desc(), F.col("_src").asc(), F.col("_tie").asc_nulls_last()
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_src") == 1
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    m = F.col("_m")
    if tolerance_us is not None:
        # parquet timestamps arrive as TIMESTAMP_NTZ, which unix_micros
        # rejects; the same cast on both sides makes the DIFFERENCE
        # timezone-independent
        gap_us = F.abs(F.unix_micros(F.col("_ts").cast("timestamp"))
                       - F.unix_micros(m[right_ts].cast("timestamp")))
        m = F.when(gap_us <= F.lit(int(tolerance_us)), F.col("_m"))
    out_cols += [m[c].alias(f"{prefix}{c}") for c in pay_cols]
    return matched.select(*out_cols)

"""Skew handling: salted repartitioning by cell prefix (north rule).

Dense geographic hotspots (cities) make cell-keyed shuffles skew: one
partition gets the Tokyo cell, 999 executors idle.  Two engine tools:

- ``cell_histogram``: cheap approx frequency of cell prefixes (sampled
  count) — the planning input.
- ``salted_repartition``: rows in hot cells get a uniform salt in
  [0, n_salts) appended to their shuffle key, spreading each hot cell over
  ``n_salts`` partitions; cold cells keep salt 0 (no fan-out).  The salt is
  a DETERMINISTIC hash of the row key — never ``rand()`` — so repartitioned
  output is identical across runs/cluster sizes (north-rule exact-match).

For joins against a per-cell dim table, broadcast sidesteps skew entirely
(see operators/pip.py); salting matters for large-large cell joins and for
per-cell aggregations whose partial aggregates are themselves huge.

AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.get_spark) handles residual skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def det_hash_mod(col, salt: str, mod: int):
    """Deterministic uniform value in [0, mod) from a row key: md5 →
    60-bit bigint → mod.  The ONE definition behind both the sampling
    filter (salt ``hs:``) and the repartition salt (salt ``salt:``) —
    the DuckDB oracle transliterates the same formula, so these must
    never drift apart."""
    return (
        F.conv(F.substring(F.md5(F.concat(
            F.lit(f"{salt}:"), col.cast("string"))), 1, 15), 16, 10)
        .cast("long") % mod
    )


def cell_histogram(df: DataFrame, cell_col: str = "cell_id",
                   fraction: float = 1.0, sample_key: str | None = None,
                   sample_mod: int = 100) -> DataFrame:
    """(cell_id, n) frequency table, optionally over a sample.

    Prefer ``sample_key`` (a stable row-id column): sampling is then a
    DETERMINISTIC content filter (md5 of the key, keep 1/``sample_mod``) —
    partition-layout independent, unlike ``df.sample`` whose row choice
    changes with file splits.  Because the filter references only the key
    column, Catalyst evaluates it below expensive derived columns (e.g. a
    pandas-UDF projection feeding ``cell_col``), so hot-key detection
    costs one cheap hash per row instead of a second full derivation."""
    if sample_key is not None:
        base = df.filter(det_hash_mod(F.col(sample_key), "hs", sample_mod) == 0)
    elif fraction < 1.0:
        base = df.sample(fraction=fraction, seed=42)
    else:
        base = df
    return base.groupBy(cell_col).agg(F.count("*").alias("n"))


def hot_cells(df: DataFrame, cell_col: str = "cell_id",
              threshold_ratio: float = 4.0, fraction: float = 1.0,
              sample_key: str | None = None,
              sample_mod: int = 100) -> list[int]:
    """Cells whose frequency exceeds ``threshold_ratio`` × the mean.

    The ratio test is scale-free, so it gives the same answer (in
    expectation) on the ``sample_key`` sample as on the full table —
    detection over 10^12 rows costs one cheap filtered pre-pass.

    ONE driver action: the mean rides as a broadcast scalar subquery and
    the threshold filter runs in the same job, so only rows ABOVE
    threshold are collected — the driver never holds the full histogram,
    which at a fine detection resolution can be millions of cells.  (The
    histogram subtree appears under both the mean aggregate and the
    filter, but the two branches execute CONCURRENTLY inside the one job
    — cheaper than the former persist + two sequential actions; the
    comparison is the same IEEE multiply/compare as the collected-mean
    form, so the hot set is identical.)"""
    hist = cell_histogram(df, cell_col, fraction, sample_key, sample_mod)
    thr = hist.agg((F.lit(threshold_ratio)
                    * F.coalesce(F.avg("n"), F.lit(0.0))).alias("_thr"))
    rows = (hist.crossJoin(F.broadcast(thr))
            .where(F.col("n") > F.col("_thr"))
            .select(cell_col).collect())
    return [r[cell_col] for r in rows]


def salted_repartition(
    df: DataFrame,
    cell_col: str = "cell_id",
    hot: list[int] | None = None,
    n_salts: int = 16,
    key_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition by (cell, salt) where only HOT cells receive salts.

    ``key_col`` seeds the deterministic salt (md5-based); when None the
    cell's own row content can't be used, so pass the row's stable id
    (doc_id etc.).  Returns the df with a ``_salt`` column (drop after the
    skew-sensitive operation).
    """
    if key_col is None:
        raise ValueError("key_col (a stable row id) is required for a deterministic salt")
    hot = hot or []
    salt = det_hash_mod(F.col(key_col), "salt", n_salts).cast("int")
    out = df.withColumn(
        "_salt",
        F.when(F.col(cell_col).isin(hot), salt).otherwise(F.lit(0)),
    )
    parts = [F.col(cell_col), F.col("_salt")]
    return (out.repartition(num_partitions, *parts) if num_partitions
            else out.repartition(*parts))


def skew_aware_cell_agg(
    df: DataFrame,
    cell_col: str = "cell_id",
    key_col: str = "doc_id",
    n_salts: int = 16,
    threshold_ratio: float = 4.0,
    aggs: list | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed cells: partial agg on (cell, salt),
    final agg on cell — the hot cell's work spreads over ``n_salts``
    reducers instead of one.

    Default metric set: count + distinct-doc count (additive / mergeable).
    """
    hot = hot_cells(df, cell_col, threshold_ratio)
    salted = salted_repartition(df, cell_col, hot, n_salts, key_col=key_col)
    partial = salted.groupBy(cell_col, "_salt").agg(
        F.count("*").alias("_n"),
        F.approx_count_distinct(key_col).alias("_nd"),
    )
    return partial.groupBy(cell_col).agg(
        F.sum("_n").alias("n_points"),
        F.sum("_nd").alias("approx_docs_ub"),  # upper bound across salts
    )

"""Deterministic stratified sampling — engine-added (a training-data
pipeline's rebalancing primitive: downsample the dominant language /
source / quality stratum without a random seed that breaks resumes).

The keep decision is a pure function of the ROW KEY: keep iff
``hash60('samp:' || key) % den < num`` for the row's stratum rate.  That
makes the sample

- **reproducible** across runs, engines and cluster sizes (the same
  ``oracle.hash60`` md5 text the cell index and dedup suites share —
  bit-identical on Spark and DuckDB, verified in tests);
- **stable under re-partitioning and resume** — no RNG state, no
  per-partition seeds, unlike ``DataFrame.sample`` whose output changes
  with the split layout;
- **consistent across tables**: sampling two tables by the same key
  keeps them join-compatible (the classic "sample users, keep all their
  events" property comes free by keying both on user).

Plan shape: a single codegen filter — no shuffle, no UDF, pushes to the
scan when the key is a stored column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import oracle as O


def stratified_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
    salt: str = "samp",
) -> DataFrame:
    """Keep each row with its stratum's exact rational rate num/den,
    decided by the shared deterministic hash of ``salt:key``.

    ``rates`` maps stratum values to (num, den); unlisted strata use
    ``default``.  den must fit the hash's uniform range (any practical
    denominator does); rates are EXACT: a stratum with K distinct keys
    keeps ~K·num/den of them, and the same key always decides the same
    way — across engines, sessions and cluster layouts.
    """
    h = F.expr(O.hash60(f"'{salt}:' || CAST({key} AS STRING)", "spark"))
    cond: Column | None = None
    keep = None
    for val, (num, den) in rates.items():
        c = (F.col(stratum) == val) & (h % den < num)
        keep = c if keep is None else keep | c
        cond = F.col(stratum) == val if cond is None else cond | (F.col(stratum) == val)
    dn, dd = default
    # NULL strata must take the default arm, matching the SQL twin's CASE
    # ELSE: `~(stratum == val)` is NULL for NULL strata, which where()
    # would DROP while the oracle keeps it at the default rate (ADVICE r4).
    not_listed = (
        (F.col(stratum).isNull() | ~cond) if cond is not None else F.lit(True)
    )
    other = not_listed & (h % dd < dn)
    keep = other if keep is None else keep | other
    return df.where(keep)


def stratified_sample_sql(
    table: str,
    stratum: str,
    key: str,
    rates: dict[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
    salt: str = "samp",
    dialect: str = "duck",
) -> str:
    """The WHERE predicate's SQL twin (same hash text, same CASE order)
    for oracle queries: returns a boolean SQL expression."""
    st = "STRING" if dialect == "spark" else "VARCHAR"
    h = O.hash60(f"'{salt}:' || CAST({key} AS {st})", dialect)
    arms = " ".join(
        f"WHEN {stratum} = '{val}' THEN ({h}) % {den} < {num}"
        for val, (num, den) in rates.items()
    )
    dn, dd = default
    return f"(CASE {arms} ELSE ({h}) % {dd} < {dn} END)"

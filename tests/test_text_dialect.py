"""Cross-dialect pinning for the text-dedup SQL generators: the SAME
dialect-templated expression must produce bit-identical values on Spark
and DuckDB for adversarial inputs the sf documents table doesn't contain
(unicode, quotes, separator characters, heavy token repeats).

This is what licenses `minhash_sql`/`band_keys_sql`/`simhash_sql` to serve
as both the engine implementation AND its correctness oracle — any md5 /
substring / cast semantic divergence between the engines shows up here
before it can silently weaken the driver-gate twins.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from projcl_spark.operators import text as T

# ≥48 chars and ≥4 tokens each (the query-template guard); chosen to poke
# md5-over-utf8, the '|' band separator, ':' salt separator, and quoting.
DOCS = [
    "the quick brown fox jumps over the lazy dog again and again tonight",
    "the quick brown fox jumps over the lazy cat again and again tonight",
    "naïve café déjà vu — ünïcode tökens with ümlauts and émojis ☃ ☂ here",
    "apostrophe's and \"double quotes\" and | pipes | and : colons : here",
    "x x x x x x x x x x x x x x x x x x x x x x x x x x x x x x x x x x",
    "mixed   runs  of   spaces collapse differently if split is sloppy ok",
]


def _frames(spark):
    pdf = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("dlx")
    con = duckdb.connect()
    con.register("dlx", pdf)
    return con


def _both(spark, con, spark_expr: str, duck_expr: str) -> tuple[list, list]:
    s = (spark.sql(f"SELECT doc_id, {spark_expr} AS v FROM dlx ORDER BY doc_id")
         .toPandas()["v"].tolist())
    d = (con.execute(f"SELECT doc_id, {duck_expr} AS v FROM dlx ORDER BY doc_id")
         .fetchdf()["v"].tolist())
    return s, d


def test_minhash_signature_cross_dialect(spark):
    con = _frames(spark)
    exprs = {
        dia: T.minhash_sql(T.shingles_sql(T.tokens("text", dia), dia), dia)
        for dia in ("spark", "duck")
    }
    s, d = _both(spark, con, exprs["spark"], exprs["duck"])
    for i, (a, b) in enumerate(zip(s, d)):
        assert list(a) == list(b), f"doc {i}: {a} != {b}"
        assert len(a) == T.K_MINHASH


def test_band_keys_cross_dialect(spark):
    con = _frames(spark)
    exprs = {
        dia: T.band_keys_sql(
            T.minhash_sql(T.shingles_sql(T.tokens("text", dia), dia), dia), dia
        )
        for dia in ("spark", "duck")
    }
    s, d = _both(spark, con, exprs["spark"], exprs["duck"])
    for i, (a, b) in enumerate(zip(s, d)):
        assert list(a) == list(b), f"doc {i}: {a} != {b}"
        assert len(a) == T.LSH_BANDS


def test_simhash_cross_dialect(spark):
    con = _frames(spark)
    exprs = {dia: T.simhash_sql(T.tokens("text", dia), dia)
             for dia in ("spark", "duck")}
    s, d = _both(spark, con, exprs["spark"], exprs["duck"])
    assert s == d


def test_winnow_fingerprint_cross_dialect(spark):
    con = _frames(spark)
    exprs = {dia: T.winnow_sql("text", dia) for dia in ("spark", "duck")}
    s, d = _both(spark, con, exprs["spark"], exprs["duck"])
    for i, (a, b) in enumerate(zip(s, d)):
        assert sorted(a) == sorted(b), f"doc {i}"


def test_minhash_paired_chunks_are_distinct(spark):
    """Components 2h and 2h+1 share a digest but must not collapse to the
    same value distribution — equal neighbors would silently halve the
    effective signature size and inflate LSH collision rates."""
    con = _frames(spark)
    expr = T.minhash_sql(T.shingles_sql(T.tokens("text", "duck"), "duck"), "duck")
    rows = con.execute(f"SELECT {expr} AS v FROM dlx").fetchdf()["v"].tolist()
    for sig in rows:
        pairs = list(zip(sig[0::2], sig[1::2]))
        assert any(a != b for a, b in pairs)

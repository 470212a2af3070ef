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


def test_pip_crossing_count_cross_dialect():
    """The pip_polygons oracle transliterates winding_contains_np edge by
    edge; pin the two on adversarial geometry the synthetic layer avoids:
    horizontal edges, points exactly AT a vertex latitude, points level
    with a horizontal edge, and near-degenerate slivers."""
    import duckdb
    import numpy as np

    from projcl_spark.operators.pip import winding_contains_np

    polys = {
        # square with horizontal top/bottom edges
        0: ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 4.0, 4.0]),
        # triangle with a vertex at y=2 (points will sit at exactly y=2)
        1: ([10.0, 14.0, 12.0], [0.0, 0.0, 2.0]),
        # thin sliver
        2: ([20.0, 24.0, 24.0], [1.0, 1.0000001, 1.0000002]),
    }
    # probe grid incl. y values exactly on vertices/edges
    xs = np.arange(-1.0, 26.0, 0.5)
    ys = np.array([-1.0, 0.0, 1.0, 1.0000001, 2.0, 3.9999999, 4.0, 5.0])
    px, py = [a.ravel() for a in np.meshgrid(xs, ys)]

    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT * FROM (SELECT unnest(?) lon, unnest(?) lat)",
                [list(map(float, px)), list(map(float, py))])
    xj = "xs[CASE WHEN i = 1 THEN len(xs) ELSE i - 1 END]"
    yj = "ys[CASE WHEN i = 1 THEN len(ys) ELSE i - 1 END]"
    cross = (
        f"CASE WHEN ((ys[i] > lat) <> ({yj} > lat)) AND "
        f"(lon < xs[i] + (lat - ys[i]) * ({xj} - xs[i]) / ({yj} - ys[i])) "
        f"THEN 1 ELSE 0 END"
    )
    inside = (f"(list_sum(list_transform(range(1, len(xs) + 1), "
              f"i -> {cross})) % 2) = 1")
    for pid, (vx, vy) in polys.items():
        want = winding_contains_np(px, py, np.array(vx), np.array(vy))
        got = con.execute(
            f"SELECT {inside} FROM (SELECT lon, lat, ? AS xs, ? AS ys FROM pts)",
            [vx, vy],
        ).fetchnumpy()
        g = np.asarray(list(got.values())[0], dtype=bool)
        assert (g == want).all(), f"poly {pid}: {int((g != want).sum())} mismatches"
        if pid == 0:
            assert want.sum() > 0  # the square actually contains probes

"""Approximate/exact nearest-neighbor search over embedding columns.

Engine-added (SURVEY.md Table B; the reference's only "similarity" compute
is the geodesic distance matrix, ``src/projcl_run.c:637-692``).  Two paths:

- ``cosine_topk``: brute-force exact top-k — the oracle-comparable baseline.
  The dot product stays JVM-side (``zip_with`` + ``aggregate`` higher-order
  functions, whole-stage codegen; no Python).  Scale shape: |Q| × |C| via
  broadcast of the (small) query side; ranking by a quantized similarity so
  results are reproducible across engines and parallelism levels.
- ``cosine_topk_lsh``: the 100-TB path — random-hyperplane signatures
  (SimHash-style) bucket the corpus so only same-bucket candidates are
  scored.  Probe multiple bucket permutations for recall; still exact
  re-scoring inside buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
# query-block cap for cosine_topk's closure-vectorized path: |Q|·dim
# doubles ship with every task and the per-batch dot matrix is
# batch × |Q| — beyond this the broadcast crossJoin plan takes over
MAX_CLOSURE_QUERIES = 1024


def with_norm(df: DataFrame, col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(f"sqrt({DOT.format(a=col, b=col)})"))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, neighbor_id, rank).

    Self-matches (same id) are excluded.  Rank orders by
    (round(sim, quantize) DESC, neighbor_id ASC) — quantized so float
    summation-order differences can't flip ranks across engines/runs.
    """
    import pandas as pd

    qrows = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("q_vec")).collect()
    if not (0 < len(qrows) <= MAX_CLOSURE_QUERIES):
        # degenerate or oversized query side: the former broadcast
        # crossJoin plan (interpreted HOF dot — slower, but unbounded)
        q = with_norm(
            queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("q_vec")),
            "q_vec", "q_norm",
        )
        c = with_norm(
            corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("c_vec")),
            "c_vec", "c_norm",
        )
        dot = DOT.format(a="q_vec", b="c_vec")
        cand = (
            F.broadcast(q).crossJoin(c)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("sim", F.round(
                F.expr(dot) / (F.col("q_norm") * F.col("c_norm")), quantize))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc())
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "sim", "rank")
        )

    # Vectorized path: the query block rides in the UDF closure and every
    # corpus batch computes all |Q| dot products in numpy — replacing the
    # interpreted per-element zip_with/aggregate fold (a CodegenFallback
    # expression) with native batch math, guide §4.2.  BIT-EXACT by
    # construction: the accumulation loops over DIMENSIONS, so each
    # (query, row) pair sums x_d·y_d in exactly the fold's sequential
    # order (acc = acc + x_d·y_d), norms are the same self-dot + sqrt,
    # and the quantized similarity (round(dot / (q_norm · c_norm))) is
    # still evaluated in the JVM on those identical doubles.
    qids = [r["query_id"] for r in qrows]
    Q = np.array([list(r["q_vec"]) for r in qrows], dtype=np.float64)
    nq, dim = Q.shape

    def _seq_self_dot(M: np.ndarray) -> np.ndarray:
        acc = np.zeros(M.shape[0])
        for d in range(M.shape[1]):
            acc = acc + M[:, d] * M[:, d]
        return acc

    q_norm = [float(v) for v in np.sqrt(_seq_self_dot(Q))]

    # no type hints: pd is function-local, so hint resolution would fail
    # under `from __future__ import annotations`; hint-less pandas_udf
    # defaults to the scalar Arrow batch signature we want
    @F.pandas_udf("array<double>")
    def _norm_dots(cv):
        C = np.array(cv.tolist(), dtype=np.float64).reshape(len(cv), dim)
        acc = np.zeros((C.shape[0], nq))
        for d in range(dim):
            acc = acc + C[:, d:d + 1] * Q[None, :, d]
        cn = np.sqrt(_seq_self_dot(C))
        return pd.Series(list(np.concatenate([cn[:, None], acc], axis=1)))

    qid_arr = F.lit(qids)
    qn_arr = F.lit(q_norm)
    e = (
        corpus.select(F.col(id_col).alias("neighbor_id"),
                      _norm_dots(F.col(vec_col)).alias("_nd"))
        .select("neighbor_id", F.element_at("_nd", 1).alias("c_norm"),
                F.posexplode(F.slice("_nd", 2, nq)))
    )
    cand = (
        e.select(
            F.element_at(qid_arr, F.col("pos").cast("int") + 1).alias("query_id"),
            "neighbor_id",
            F.round(F.col("col")
                    / (F.element_at(qn_arr, F.col("pos").cast("int") + 1)
                       * F.col("c_norm")), quantize).alias("sim"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    max_train: int = 65536,
    seed: int = 42,
    kmeans_iters: int = 10,
    quantize: int = 6,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer buckets the corpus into inverted
    lists; queries probe their ``n_probe`` nearest centroids and re-score
    exactly inside those lists.

    Scale shape: centroid table is tiny (broadcast with the closure); the
    corpus is scanned once to attach ``ivf_cell`` (pure JVM argmax over
    centroid dot products); the query↔corpus meet is an equi-join on
    ``ivf_cell`` — shuffle-partitionable, never a cross product.

    The coarse quantizer is either supplied (``centroids``, e.g. from
    ``fixed_centroids`` or an offline training job — nothing is collected)
    or trained by a seeded fixed-round spherical k-means over a BOUNDED
    training set: a deterministic ``sort(id).limit(max_train)``
    (TakeOrdered — no full shuffle, no full-corpus ``toPandas``; at 100 TB
    the driver sees at most ``max_train`` rows, whatever the layout).
    ``sample_fraction < 1`` thins the scan first but is partition-layout
    dependent (``df.sample`` hashes per partition) — opt-in only; the
    default stays layout-independent so results are reproducible across
    repartitionings.
    """
    if centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        norms = np.linalg.norm(C, axis=1, keepdims=True)
        # already-unit centroids pass through UNTOUCHED: dividing by a
        # norm of 1.0±ulp perturbs low-order bits, which would break
        # bit-for-bit parity with an oracle that folds the same array as
        # SQL literals (fixed_centroids → _o_ann_ivf)
        if not np.allclose(norms, 1.0, atol=1e-9):
            C = C / norms
    else:
        sample = corpus.select(id_col, vec_col)
        if sample_fraction < 1.0:
            sample = sample.sample(fraction=sample_fraction, seed=seed)
        # deterministic, bounded driver collect (partition-order independent)
        pdf = sample.sort(id_col).limit(max_train).toPandas()
        X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
        for _ in range(kmeans_iters):  # spherical k-means, fixed rounds
            assign = np.argmax(X @ C.T, axis=1)
            for j in range(len(C)):
                m = X[assign == j]
                if len(m):
                    c = m.mean(axis=0)
                    C[j] = c / np.linalg.norm(c)

    def cell_expr(vec: str, top: int) -> F.Column:
        """array of the ``top`` centroid ids by dot product (JVM-side)."""
        dots = [
            F.expr(DOT.format(a=vec, b="array(" + ",".join(repr(float(v)) for v in row) + ")"))
            for row in C
        ]
        arr = F.array(*[
            F.struct(d.alias("d"), F.lit(j).alias("j")) for j, d in enumerate(dots)
        ])
        ranked = F.reverse(F.array_sort(arr))
        return F.slice(F.transform(ranked, lambda s: s.j), 1, top)

    c = with_norm(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", "c_norm",
    ).withColumn("ivf_cell", F.element_at(cell_expr("c_vec", 1), 1))
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", "q_norm",
    ).withColumn("ivf_cell", F.explode(cell_expr("q_vec", n_probe)))
    dot = DOT.format(a="q_vec", b="c_vec")
    cand = (
        q.join(c, "ivf_cell", "inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(F.expr(dot) / (F.col("q_norm") * F.col("c_norm")), quantize).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def fixed_codebooks(dim: int, m_sub: int, ksub: int, seed: int) -> np.ndarray:
    """Seeded product-quantization codebooks: ``m_sub`` subspaces of
    ``dim/m_sub`` dims, ``ksub`` unit entries each — shape (m, ksub, dsub).

    Unit entries make the per-subspace encode an argmax of dot products
    (same machinery as the IVF coarse quantizer), and let the gate query
    and its DuckDB oracle share the exact codebooks as folded literals;
    production training (per-subspace k-means over a bounded sample) rides
    the same ``codebooks=`` seam."""
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((m_sub, ksub, dim // m_sub))
    return B / np.linalg.norm(B, axis=2, keepdims=True)


def _arr_lit(v) -> str:
    return "array(" + ",".join(repr(float(x)) for x in v) + ")"


def cosine_topk_ivf_pq(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: int = 6,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS architecture re-expressed relationally):
    inverted lists prune candidates, PRODUCT-QUANTIZED codes score them.

    Scale shape — this is the variant whose corpus state is COMPRESSED:
    each corpus row carries (ivf_cell, m_sub small-int codes) instead of
    the float vector, so the candidate scan reads ~m bytes/row instead of
    4·dim (32× at dim 64 / m 8).  Encode (argmax per subspace over the
    codebook, pure JVM expressions) runs ONCE at ingest; the query↔corpus
    meet stays the IVF cell equi-join; scoring is an asymmetric distance:
    sim ≈ dot(query, reconstruction) / ‖query‖ where the reconstruction
    concatenates the coded entries — built HERE as a column expression
    from the folded codebooks, so the whole scoring path is
    whole-stage-codegen SQL with no Python.

    ``centroids``/``codebooks`` are required seams (``fixed_centroids`` /
    ``fixed_codebooks`` or offline training output) — nothing is
    collected.  Ranking is (round(sim, quantize) DESC, id ASC), tie-coded
    exactly like the other ANN paths so the DuckDB twin can mirror it.
    """
    if centroids is None or codebooks is None:
        raise ValueError("cosine_topk_ivf_pq requires centroids= and codebooks=")
    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(codebooks, dtype=np.float64)
    m_sub, ksub, dsub = B.shape

    def cell_expr(vec: str, top: int) -> F.Column:
        dots = [F.expr(DOT.format(a=vec, b=_arr_lit(row))) for row in C]
        arr = F.array(*[
            F.struct(d.alias("d"), F.lit(j).alias("j")) for j, d in enumerate(dots)
        ])
        return F.slice(F.transform(F.reverse(F.array_sort(arr)), lambda s: s.j), 1, top)

    def code_expr(vec: str, m: int) -> F.Column:
        # argmax over the subspace codebook; ties → larger code (the
        # reverse(array_sort(struct(d, j))) order the oracle mirrors with
        # ORDER BY d DESC, code DESC)
        sub = f"slice({vec}, {m * dsub + 1}, {dsub})"
        dots = [F.expr(DOT.format(a=sub, b=_arr_lit(B[m][j]))) for j in range(ksub)]
        arr = F.array(*[
            F.struct(d.alias("d"), F.lit(j).alias("j")) for j, d in enumerate(dots)
        ])
        return F.element_at(F.reverse(F.array_sort(arr)), 1)["j"]

    # reconstruction = concat of the coded entries, m-order — a pure
    # expression over the codes column and the folded codebook literals
    recon = "concat(" + ",".join(
        f"element_at(array({','.join(_arr_lit(B[m][j]) for j in range(ksub))}), "
        f"element_at(codes, {m + 1}) + 1)"
        for m in range(m_sub)
    ) + ")"

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .withColumn("ivf_cell", F.element_at(cell_expr("c_vec", 1), 1))
        .withColumn("codes", F.array(*[code_expr("c_vec", m) for m in range(m_sub)]))
        # the float vector is DROPPED after encode — candidates carry only
        # (cell, codes), the compressed-scan contract
        .drop("c_vec")
        .withColumn("recon", F.expr(recon))
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", "q_norm",
    ).withColumn("ivf_cell", F.explode(cell_expr("q_vec", n_probe)))
    sim = F.expr(DOT.format(a="q_vec", b="recon")) / F.col("q_norm")
    cand = (
        q.join(c, "ivf_cell", "inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, quantize).alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def fixed_centroids(dim: int, n_cells: int, seed: int) -> np.ndarray:
    """Seeded random unit centroids — a data-independent coarse quantizer.

    Lets the gate query and its DuckDB oracle share the exact same IVF
    structure as folded literals (the LSH-plane pattern); production use
    would pass k-means output through the same ``centroids=`` seam.
    """
    rng = np.random.default_rng(seed)
    C = rng.standard_normal((n_cells, dim))
    return C / np.linalg.norm(C, axis=1, keepdims=True)


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def simhash_signature_col(vec_col: str, planes: np.ndarray) -> F.Column:
    """Bit-signature of a vector against fixed hyperplanes, JVM-side.

    Builds sum(v[i]·p[i]) per plane with ``aggregate`` over a zipped array —
    no Python UDF; the planes ride in as array literals.
    """
    bits = []
    for row in planes:
        lit = "array(" + ",".join(repr(float(v)) for v in row) + ")"
        dot = DOT.format(a=vec_col, b=lit)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END)")
    packed = " + ".join(f"CAST({b} AS BIGINT) * {1 << i}" for i, b in enumerate(bits))
    return F.expr(f"({packed})")


def signature_sql(vec_col: str, planes: np.ndarray, dialect: str) -> str:
    """The SAME packed hyperplane signature as ``simhash_signature_col``,
    rendered for either dialect — lets the DuckDB oracle rebuild LSH buckets
    bit-for-bit (plane literals are folded in)."""
    from ..oracle import _r

    bits = []
    for row in planes:
        lit = "[" + ",".join(_r(v) for v in row) + "]" if dialect == "duck" else \
              "array(" + ",".join(repr(float(v)) for v in row) + ")"
        if dialect == "duck":
            dot = (f"list_sum(list_transform(list_zip({vec_col}, {lit}), "
                   f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")
        else:
            dot = DOT.format(a=vec_col, b=lit)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END)")
    packed = " + ".join(f"CAST({b} AS BIGINT) * {1 << i}" for i, b in enumerate(bits))
    return f"({packed})"


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    seed: int = 42,
    quantize: int = 6,
) -> DataFrame:
    """LSH-bucketed cosine top-k (recall < 1 by design — the scale path).

    Each of ``n_tables`` independent hyperplane sets produces a bucket id;
    query and corpus rows meet on (table, bucket) equi-join keys — a
    shuffle-partitionable join instead of a cross product.
    """
    tables = [(t, _hyperplanes(dim, n_bits, seed + t)) for t in range(n_tables)]

    def bucketed(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        base = df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
        parts = [
            base.select(
                id_alias, vec_alias,
                F.lit(t).alias("tbl"),
                simhash_signature_col(vec_alias, planes).alias("bucket"),
            )
            for t, planes in tables
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out

    q = with_norm(bucketed(queries, "query_id", "q_vec"), "q_vec", "q_norm")
    c = with_norm(bucketed(corpus, "neighbor_id", "c_vec"), "c_vec", "c_norm")
    dot = DOT.format(a="q_vec", b="c_vec")
    cand = (
        q.join(c, ["tbl", "bucket"], "inner")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(F.expr(dot) / (F.col("q_norm") * F.col("c_norm")), quantize).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )

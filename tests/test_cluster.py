"""Connected-components / dedup-cluster operator tests (operators.cluster)."""

from __future__ import annotations

from projcl_spark.operators.cluster import connected_components, dedup_clusters


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs] or [(None, None)], "doc_a long, doc_b long"
    ).dropna()


def test_cc_chain_and_singletons(spark):
    """A 5-node chain (worst diameter per edge) + 2 isolated nodes: the
    chain collapses to its min id, singletons label themselves."""
    nodes = _nodes(spark, [1, 2, 3, 4, 5, 10, 20])
    edges = _edges(spark, [(2, 1), (2, 3), (4, 3), (4, 5)])
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 20: 20}


def test_cc_two_components_with_cycle(spark):
    """Cycles and duplicate/reversed edges must not break convergence."""
    nodes = _nodes(spark, [1, 2, 3, 7, 8, 9])
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (2, 1), (8, 7), (8, 9), (9, 7)])
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_dedup_clusters_canonical_rules(spark):
    """Canonical = longest doc; ties broken by SMALLEST doc_id."""
    docs = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 250), (9, 50), (10, 70), (11, 70)],
        "doc_id long, n_chars long",
    )
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    rows = {r.cluster_id: r for r in dedup_clusters(docs, edges).collect()}
    assert set(rows) == {1, 9, 10}
    # cluster 1: lengths 100/250/250 → canonical = min(2,3) = 2
    assert rows[1].n_docs == 3 and rows[1].canonical == 2
    assert rows[9].n_docs == 1 and rows[9].canonical == 9
    # cluster 10: tie 70/70 → canonical = 10
    assert rows[10].n_docs == 2 and rows[10].canonical == 10


def test_cc_long_chain_converges_fast(spark):
    """A 120-node path has diameter 119 — plain min-label hooking would
    need 119 rounds (> MAX_CC_ROUNDS); pointer jumping must converge it
    within the round cap AND still produce the component min."""
    n = 120
    nodes = _nodes(spark, list(range(n)))
    edges = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, edges).collect()}
    assert got == {i: 0 for i in range(n)}


def test_cc_random_graph_matches_union_find(spark):
    """Deterministic pseudo-random graph vs a python union-find oracle."""
    import hashlib

    n, m = 200, 150
    def h(i):
        return int(hashlib.md5(f"edge:{i}".encode()).hexdigest()[:12], 16)
    pairs = [(h(i) % n, h(i + 10_000) % n) for i in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]
    parent = list(range(n))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # union-find roots are not guaranteed minimal per component — normalize
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    want = {i: comp_min[find(i)] for i in range(n)}
    nodes = _nodes(spark, list(range(n)))
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, _edges(spark, pairs)).collect()}
    assert got == want


def test_cc_no_edges_converges_round_zero(spark):
    nodes = _nodes(spark, [5, 6])
    got = {r.doc_id: r.cluster_id
           for r in connected_components(nodes, _edges(spark, [])).collect()}
    assert got == {5: 5, 6: 6}


def _union_find_oracle(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    return {i: comp_min[find(i)] for i in range(n)}


def test_cc_powerlaw_10k_matches_union_find(spark):
    """Adversarial scale/shape: 10^4 nodes, power-law degree (a few hub
    nodes touch thousands of edges — the skew shape real near-dup graphs
    have), hypothesis-drawn seeds vs the union-find oracle.  Two examples
    keep it inside the CI budget; deadline disabled (Spark wall)."""
    import numpy as np
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    n, m = 10_000, 12_000

    @settings(max_examples=2, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(seed=st.integers(0, 2**32 - 1))
    def check(seed):
        rng = np.random.default_rng(seed)
        # preferential-attachment-ish: u^3 biases endpoints to low ids →
        # hub degrees follow a heavy tail (max degree measured ~10% of m)
        a = np.floor(n * rng.random(m) ** 3).astype(np.int64)
        b = np.floor(n * rng.random(m)).astype(np.int64)
        keep = a != b
        pairs = list(zip(a[keep].tolist(), b[keep].tolist()))
        want = _union_find_oracle(n, pairs)
        nodes = spark.range(n).withColumnRenamed("id", "doc_id")
        edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
        got = {r.doc_id: r.cluster_id
               for r in connected_components(nodes, edges).collect()}
        assert got == want

    check()

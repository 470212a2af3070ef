"""Duplicate-pair → cluster → canonical-doc selection (engine-added).

The dedup suite (``operators.text``) emits near-dup PAIRS (MinHash/LSH
band join, Jaccard, embedding cosine); shrinking a training corpus
additionally needs the pairs grouped into duplicate CLUSTERS with one
kept canonical document per cluster.  This module closes that gap with a
pure-DataFrame connected-components pass:

- **edges are LSH-bounded, never all-pairs** — the input is the band-join
  pair list, whose size is bounded by bucket collisions, so the iterative
  join is an equi-join on doc_id each round;
- **min-label propagation**: every node starts labelled with itself; each
  round every node takes the min label over itself and its neighbors.
  Hooking alone converges in O(component diameter) rounds; each round
  additionally POINTER-JUMPS (label ← label's label, the Shiloach–Vishkin
  path-doubling idea), which compresses label chains geometrically —
  O(log diameter) rounds overall, so a 10^6-node path converges in ~20
  rounds instead of 10^6.  Both steps only ever move a node's label to a
  smaller id within its own component, so the fixpoint is the
  component-minimum id (the alternating large-star/small-star contraction
  of Kiveris et al., SoCC'14, is the further-optimized relative; this
  loop keeps one code path);
- **bounded driver actions**: one tiny ``count`` per round for the
  convergence check, nothing else leaves the executors;
- label state is two BIGINTs per node — lazily ``localCheckpoint``-ed
  every round (default) so the logical plan depth stays CONSTANT: the
  pointer-jump self-join embeds two copies of the prior round's plan, so
  any uncheckpointed stretch doubles the tree per round and optimizer
  time explodes.  The lazy checkpoint materializes inside the
  convergence-sum action (zero extra jobs); at cluster scale, substitute
  a reliable parquet/checkpoint-dir materialization —
  ``plans.checkpoint`` has the sink.

DuckDB can express the same fixpoint as a recursive CTE (label sets
dedup'd by UNION), which is the oracle twin ``__spark_entry__`` uses for
the ``dedup_clusters`` gate query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ROUNDS = 25


def _cc_labels(
    edges: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = MAX_CC_ROUNDS,
    dedupe_edges: bool = True,
) -> DataFrame:
    """The min-label/pointer-jump loop over EDGE ENDPOINTS only →
    eagerly-checkpointed ``(id, _cc_label)`` where ``_cc_label`` is the
    component-minimum id.  Isolated nodes are absent (they label
    themselves); callers attach node payloads with ONE left join +
    ``coalesce(_cc_label, id)`` — factoring the loop out lets
    ``dedup_clusters``/``grid_dbscan`` fold the singleton fill-in and
    their weight/payload attach into a single pass over the node table
    instead of two back-to-back joins on the same key.
    """
    # persist the symmetrized edge list: the upstream pair plan (an LSH
    # band join in the dedup case) would otherwise re-execute EVERY round.
    # Symmetrize with an in-task explode, NOT a self-union: a union embeds
    # the (expensive) pair plan twice, so the persist's first
    # materialization would execute the band join once per branch.
    sym = edges.select(
        F.explode(F.array(
            F.struct(F.col(src_col).alias("s"), F.col(dst_col).alias("d")),
            F.struct(F.col(dst_col).alias("s"), F.col(src_col).alias("d")),
        )).alias("_e")
    ).select("_e.s", "_e.d")
    if dedupe_edges:
        sym = sym.distinct()
    sym = sym.persist()
    # the loop runs over EDGE ENDPOINTS only — the LSH-bounded dup set, a
    # tiny fraction of the corpus.  Isolated docs never enter a shuffle:
    # they become singletons in the final left join.  (Looping over the
    # full node table would persist O(corpus) label state per round —
    # ~16 TB at 10^12 docs — for rows whose label never changes.)
    #
    # Fused first hook: initializing label=id and then running a hook round
    # computes min(id, min neighbor) — ONE groupBy over the edge list
    # produces that directly, so the init IS round one (replaces the old
    # endpoint-distinct + a full loop round: one shuffle instead of three).
    labels = (
        sym.groupBy(F.col("s").alias("id"))
        .agg(F.min("d").alias("_mn"))
        .select("id", F.least("id", "_mn").alias("label"))
        .localCheckpoint(eager=False)
    )

    def _round(lbl: DataFrame, jump: bool) -> DataFrame:
        nbr = (
            sym.join(lbl.withColumnRenamed("id", "s"), "s")
            .select(F.col("d").alias("id"), "label")
        )
        new = (
            lbl.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        if jump:
            # pointer jump: label ← label's label (every label IS a node
            # id, so the self-join resolves; coalesce guards no-match).
            # Deferred past the first post-init round: shallow near-dup
            # graphs converge by then without it; deep chains still get
            # the O(log diameter) doubling from the second round on (the
            # fused init already counts as one hook).
            parent = new.select(F.col("id").alias("_pid"),
                                F.col("label").alias("_plabel"))
            new = (
                new.join(parent, new["label"] == parent["_pid"], "left")
                .select("id", F.coalesce("_plabel", "label").alias("label"))
            )
        # Truncate the logical plan EVERY round (``checkpoint_every`` is
        # kept in the signature for compatibility; coarser cadences
        # measured strictly worse — the jump join embeds TWO copies of
        # the prior round's plan, 143 s vs 7 s on a 120-node chain at
        # cadence 5 vs 1).  The checkpoint is LAZY — it materializes
        # inside the batched convergence action below, zero extra jobs;
        # the stored state is the label table, O(dup docs).  On a real
        # cluster swap localCheckpoint for a reliable checkpoint dir.
        return new.localCheckpoint(eager=False)

    def _label_sum(df: DataFrame):
        # decimal(38,0): exact and overflow-proof (int64 sum of 10^12
        # 10^12-scale ids would wrap)
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))
                      ).collect()[0][0]

    # Convergence signal: both hooking and jumping only ever DECREASE a
    # label, so the label sum is strictly decreasing until the fixpoint —
    # sum unchanged ⟺ every label unchanged.  One scalar-aggregate action
    # per round, which also materializes that round's lazy checkpoint.
    # (A two-rounds-per-action variant with both sums in one
    # union-aggregate job was tried and REVERTED in r6: the deeper
    # single-job stage chain measured ~0.3 s SLOWER than two shallow
    # actions at sf0.1 — same lesson as the segment-join checkpoint.)
    prev_sum = _label_sum(labels)  # also materializes the fused first hook
    converged = False
    for rnd in range(max_rounds):
        labels = _round(labels, jump=rnd >= 1)
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        sym.unpersist(blocking=False)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds — "
            "with pointer jumping this needs a component diameter > "
            f"~2^{max_rounds}; inspect the edge input"
        )
    # Truncate the loop's lineage BEFORE releasing the per-round cache:
    # returning the raw plan and unpersisting would make every downstream
    # consumer replay all rounds from the source (measured: 60 re-scans of
    # the signature stage in the final dedup_clusters plan).  The label
    # table is two BIGINTs per node — the eager localCheckpoint is one tiny
    # job; swap in a reliable checkpoint dir / parquet stage on a cluster
    # where executor loss matters.
    loop_labels = labels.select(
        "id", F.col("label").alias("_cc_label")
    ).localCheckpoint(eager=True)
    sym.unpersist(blocking=False)
    return loop_labels


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_rounds: int = MAX_CC_ROUNDS,
    checkpoint_every: int = 1,
    dedupe_edges: bool = True,
) -> DataFrame:
    """(nodes, undirected edges) → (id_col, cluster_id) where cluster_id is
    the component-minimum node id.

    ``nodes`` must contain every vertex (isolated docs become singleton
    clusters); ``edges`` rows are unordered pairs.  Deterministic at any
    parallelism: the fixpoint (component min) is parallelism-independent.
    Pass ``dedupe_edges=False`` when the pair list is already unique (an
    aggregated band join is) — min-aggregation is idempotent under
    duplicate edges, and skipping the ``distinct`` removes a full shuffle
    of the edge list, the operator's widest table.
    """
    loop_labels = _cc_labels(edges, src_col=src_col, dst_col=dst_col,
                             max_rounds=max_rounds,
                             dedupe_edges=dedupe_edges)
    # singletons (no edges) label themselves; no shuffle of the node table
    # beyond this one join against the (tiny) loop result
    return nodes.select(id_col).join(
        loop_labels.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col, F.coalesce("_cc_label", F.col(id_col)).alias("cluster_id")
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """docs(id, weight) + duplicate pairs → per-cluster
    (cluster_id, n_docs, canonical).

    The canonical document is the cluster member with the LARGEST
    ``weight_col`` (keep-the-longest — the usual corpus-shrinking rule),
    ties broken by smallest id; both rules are explicit so the result is
    engine-independent.  ``cluster_id`` is the component-min doc id.
    """
    # the LSH band join emits each pair once (SELECT DISTINCT, doc_a <
    # doc_b — operators/text.py:272-276), so skip the edge re-dedupe
    lbl = _cc_labels(pairs, src_col=src_col, dst_col=dst_col,
                     dedupe_edges=False)
    # ONE pass over the doc table: the singleton fill-in
    # (coalesce(_cc_label, id)) and the weight attach ride the same left
    # join against the tiny label table — the former shape (CC's node
    # left-join, then a second inner join for the weights) keyed the
    # corpus by doc_id twice for one decision.
    member = docs.select(id_col, weight_col).join(
        lbl.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        F.coalesce("_cc_label", F.col(id_col)).alias("cluster_id"),
        id_col, weight_col,
    )
    # ONE map-side-combinable aggregate instead of the former sort-window
    # pair (row_number + count over cluster_id): max_by over the
    # (weight, -id) struct IS the keep-the-longest / ties-to-min-id rule
    # — (weight, -id) pairs are unique because ids are — and the
    # exchange now moves per-cluster partials, not every member row.
    return member.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(f"max_by({id_col}, struct({weight_col}, -{id_col}))")
        .alias("canonical"),
    )

"""Grid-DBSCAN — density-based spatial clustering over the cell lattice
(engine-added; the standard way to turn a 100-TB point corpus's density
surface into discrete hotspot REGIONS, where ``stats.getis_ord_gstar``
only scores individual cells).

Classic DBSCAN is point-to-point (an all-pairs ε-neighborhood problem);
the scale-safe grid formulation buckets points into cells first and runs
the density logic on the CELL table — O(occupied cells), never O(points²):

1. per-cell counts (one map-side-combinable aggregate of the corpus —
   the only stage that touches points);
2. neighborhood density = 3×3 queen-window sum (in-task 9-way fan-out +
   one cell-sized equi-join, same lattice conventions as
   ``operators.stats``: E/W lon wrap, N/S clip);
3. CORE cells: density ≥ min_pts (absolute), or ≥ ratio × the mean
   occupied-cell density (relative, EXACT integer cross-multiplication —
   the scale-free default: the same query is meaningful at sf0.001 and
   at 100 TB);
4. clusters = connected components of queen-adjacent core cells, via
   ``operators.cluster.connected_components`` (pointer-jumping min-label
   loop, O(log diameter) rounds, edge-endpoint-bounded state).

Determinism is total: counts, window sums and the threshold comparison
are exact integer arithmetic, and the CC fixpoint (component-minimum
cell id) is parallelism-independent.  DuckDB expresses the same fixpoint
as a recursive CTE — the oracle twin of the ``dbscan_cells`` gate query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import _scale


def _queen_fan(df: DataFrame, res: int, include_self: bool,
               out: str = "nc") -> DataFrame:
    """Explode each cell row into its queen (8-way) neighborhood ids —
    E/W wrap modulo 2^res, N/S clip at the poles.  In-task fan-out: no
    shuffle, output is ≤ 9 rows per input row."""
    n_s = _scale(res)
    ix = F.floor(F.col("c") / n_s).cast("long")
    iy = (F.col("c") % n_s).cast("long")
    cols = []
    for dx in (-1, 0, 1):
        nx = ((ix + dx) % n_s + n_s) % n_s
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                if include_self:
                    cols.append(F.col("c").cast("long"))
                continue
            nid = nx * n_s + iy + dy
            if dy == 0:
                cols.append(nid)
            elif dy > 0:
                cols.append(F.when(iy + dy < n_s, nid))
            else:
                cols.append(F.when(iy + dy >= 0, nid))
    return df.withColumn(out, F.explode(F.array_compact(F.array(*cols))))


def grid_dbscan(
    cells: DataFrame,
    res: int,
    min_pts: int | None = None,
    density_ratio: tuple[int, int] = (6, 5),
    cell: str = "cell_id",
    val: str = "cnt",
) -> DataFrame:
    """(cell_id, cnt) rollup → (cell_id, hood_n, cluster_id) for CORE
    cells.  ``min_pts`` sets an absolute 3×3-density threshold; when
    None, a cell is core iff  den·hood_n·n_occ ≥ num·Σhood  (density ≥
    num/den × mean — integer cross-multiplication, no float ever).

    cluster_id is the component-minimum core cell id.  Border/noise
    cells are excluded by definition (grid-DBSCAN's core-only contract;
    a caller wanting border assignment joins its cells to the output on
    queen adjacency afterwards).
    """
    base = cells.select(
        F.col(cell).cast("long").alias("c"), F.col(val).cast("long").alias("v")
    )
    fan = _queen_fan(base, res, include_self=True)
    hood = (
        fan.select("c", "nc")
        .join(base.select(F.col("c").alias("nc"), F.col("v").alias("xv")), "nc")
        .groupBy("c")
        .agg(F.sum("xv").alias("hood_n"))
    )
    if min_pts is not None:
        core = hood.where(F.col("hood_n") >= min_pts)
    else:
        num, den = density_ratio
        g = hood.agg(F.count("*").alias("n_occ"),
                     F.sum("hood_n").alias("sum_hood"))
        core = (
            hood.crossJoin(F.broadcast(g))
            .where(den * F.col("hood_n") * F.col("n_occ")
                   >= num * F.col("sum_hood"))
            .select("c", "hood_n")
        )
    # queen adjacency restricted to core cells: fan core cells out and
    # keep targets that are also core.  The CC loop re-reads edges every
    # round — localCheckpoint cuts the replay of the whole density stage.
    core = core.localCheckpoint()
    edges = (
        _queen_fan(core.select("c"), res, include_self=False)
        .join(core.select(F.col("c").alias("nc")), "nc")
        .select(F.col("c").alias("ca"), F.col("nc").alias("cb"))
    )
    from .cluster import _cc_labels

    # ONE pass over the core-cell table: the label loop runs on edge
    # endpoints only, and the singleton fill-in (coalesce(_cc_label, c))
    # rides the same left join that attaches hood_n — the former shape
    # (connected_components' node left-join, then a second inner join
    # back onto core) keyed the core table by cell id twice.
    lbl = _cc_labels(edges, src_col="ca", dst_col="cb", dedupe_edges=False)
    return (
        core.join(lbl.withColumnRenamed("id", "c"), "c", "left")
        .select(F.col("c").alias(cell), "hood_n",
                F.coalesce("_cc_label", F.col("c"))
                .cast("long").alias("cluster_id"))
    )


def cell_bfs(
    cells: DataFrame,
    res: int,
    source: DataFrame,
    max_hops: int = 10,
    cell: str = "cell_id",
    cells_unique: bool = False,
) -> DataFrame:
    """Breadth-first hop distance over the occupied-cell queen-adjacency
    graph, from a ONE-ROW ``source`` DataFrame (column ``cell``) —
    grid-graph reachability ("how many cell steps from the hotspot to
    every reachable region?") without ever materializing edges globally.

    Frontier expansion: each round fans the CURRENT FRONTIER (not the
    whole graph) to its queen neighbors, keeps occupied ones, anti-joins
    the visited set, assigns hop = round.  State is O(visited cells);
    rounds ≤ ``max_hops`` (a reachability horizon, like the CC loop's
    round cap); one tiny count per round is the only driver action.
    BFS level = min-hop distance — a parallelism-independent fixpoint,
    expressible in DuckDB as a bounded recursive CTE (the oracle twin).

    Returns (cell_id, hops) for every cell within ``max_hops`` of the
    source (source itself at 0).  A source not in ``cells`` yields an
    empty result (nothing is reachable).
    """
    # ``cells_unique=True`` skips the de-dup shuffle when the caller's
    # cell table is unique by construction (a groupBy rollup is) — a
    # ``distinct`` on already-unique data is a pure extra exchange +
    # stage wave on the loop's critical path (guide §2.4).
    occ = cells.select(F.col(cell).cast("long").alias("c"))
    if not cells_unique:
        occ = occ.distinct()
    occ = occ.localCheckpoint(eager=False)
    src = occ.join(source.select(F.col(cell).cast("long").alias("c")), "c")
    visited = src.select("c", F.lit(0).alias("hops")).localCheckpoint(eager=False)
    frontier = visited

    # TWO shells per materialization round, ONE driver action each (the
    # r4-era two-hop variant lost because every shell then paid an eager
    # checkpoint + count — 3 jobs per shell; with every checkpoint LAZY
    # and the convergence ``count`` as the round's only action, batching
    # halves the dominant cost, the per-action scheduling wave: measured
    # 4.5–4.8 s → ~3.4 s at sf0.1 for the same fixpoint).  The hop
    # number travels as a data column (hops + 1 over the frontier, not a
    # per-round literal) and ``visited`` stays a flat union of
    # checkpointed RDDs, so every round presents the same plan shape and
    # codegen is reused.  groupBy-min over the fanned targets ≡ the
    # former distinct (all frontier rows carry the same hop value);
    # shell h+1 additionally anti-joins shell h.  An odd ``max_hops``
    # gets a final single-hop round.
    def _expand(front, seen):
        return (
            _queen_fan(front, res, include_self=False)
            .select(F.col("nc").alias("c"), (F.col("hops") + 1).alias("hops"))
            .groupBy("c").agg(F.min("hops").alias("hops"))
            .join(occ, "c")
            .join(seen.select("c"), "c", "left_anti")
            .localCheckpoint(eager=False)
        )

    h = 0
    while h < max_hops:
        nxt1 = _expand(frontier, visited)
        if h + 1 < max_hops:
            nxt2 = _expand(nxt1, visited.unionByName(nxt1))
            nxt = nxt1.unionByName(nxt2).localCheckpoint(eager=False)
            h += 2
        else:
            nxt = nxt1
            h += 1
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.where(F.col("hops") == h)
    return visited.select(F.col("c").alias(cell), F.col("hops").cast("int"))

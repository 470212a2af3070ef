#!/usr/bin/env python
"""Round-6 optimization harness (separate from the FROZEN bench.py).

Sub-commands:

  python bench_extra.py explain q1,q2,...  [--suffix before]
      Capture ``.explain("formatted")`` of declared queries into
      plans/r06/<name>_<suffix>.txt (the judge-facing plan evidence).

  python bench_extra.py phases <arm>
      Per-phase wall breakdown of one expensive bench arm (each phase
      forced through the noop sink, guide §1.4), printed as JSON.

  python bench_extra.py time <arm1,arm2,...> [--n 3]
      Re-time a subset of bench arms with the frozen bench harness
      methodology (best-of-n, noop sink) without clobbering
      BENCH/bench_latest.json.

Environment: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS — same contract as
bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def _spark():
    from projcl_spark.session import get_spark

    return get_spark("projcl-bench-extra", cores=CPUS)


def _force(df):
    df.write.format("noop").mode("overwrite").save()


class _T:
    """Phase timer: with t("name"): ... accumulates wall per phase."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self._name = None
        self._t0 = 0.0

    def __call__(self, name):
        self._name = name
        return self

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *a):
        self.phases[self._name] = round(
            self.phases.get(self._name, 0.0) + time.time() - self._t0, 3)


def cmd_explain(names: list[str], suffix: str) -> None:
    import contextlib
    import io

    import __spark_entry__ as E

    spark = _spark()
    qs = E.queries()
    os.makedirs(PLANS_DIR, exist_ok=True)
    for n in names:
        if n not in qs:
            print(f"SKIP unknown query {n}", file=sys.stderr)
            continue
        df = qs[n](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(PLANS_DIR, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


def _steal() -> int:
    """Hypervisor steal jiffies (col 8 of /proc/stat cpu line) — the
    repo's own quiet-window discipline: wall tracks steal 1:1, so a
    reading with a large steal delta is host noise, not the engine."""
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def cmd_time(names: list[str], n_iter: int) -> None:
    import bench

    spark = _spark()
    qs = bench.build_queries(spark, SF_DIR)
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    out, steal = {}, {}
    for name in names:
        best = float("inf")
        s0 = _steal()
        for _ in range(n_iter):
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name]()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        steal[name] = _steal() - s0
    print(json.dumps({"queries": out, "sum": round(sum(out.values()), 3),
                      "steal_jiffies": steal}))
    spark.stop()


# --------------------------------------------------- per-arm phase probes ---


def _phases_dedup_clusters(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.operators.cluster import connected_components
    from projcl_spark.operators.text import CLUSTER_MATCH_T, all_docs_len_sql

    with t("pairs_build+force"):
        pairs = E._minhash_pairs_df(spark, SF_DIR).filter(
            F.col("n_match") >= CLUSTER_MATCH_T)
        _force(pairs)
    with t("docs_force"):
        docs = spark.sql(all_docs_len_sql("spark"))
        _force(docs)
    with t("cc_loop"):
        cc = connected_components(docs, pairs, id_col="doc_id",
                                  src_col="doc_a", dst_col="doc_b",
                                  dedupe_edges=False)
        _force(cc)
    with t("full_query_again"):
        _force(E.q_dedup_clusters(spark, SF_DIR))


def _phases_cell_bfs(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.index.cells import cell_id_col
    from projcl_spark.operators.dbscan import cell_bfs

    ks = ("l_orderkey", "l_linenumber")
    with t("cells_rollup"):
        pts = E._points_df(spark, SF_DIR, "lineitem", ks)
        cells = pts.groupBy(
            cell_id_col(F.col("lon"), F.col("lat"), E._BFS_RES).alias("cell_id")
        ).agg(F.count("*").alias("cnt")).localCheckpoint()
    with t("source_pick"):
        source = (cells.orderBy(F.col("cnt").desc(), F.col("cell_id").asc())
                  .limit(1).select("cell_id"))
    with t("bfs_loop"):
        out = cell_bfs(cells, E._BFS_RES, source, max_hops=E._BFS_HOPS)
        _force(out.select("cell_id", "hops"))


def _phases_voronoi(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.operators.allocate import nearest_facility

    with t("pts_force"):
        pts = E._points_df(spark, SF_DIR, "orders", ("o_orderkey",))
        _force(pts)
    with t("fac_collect"):
        fac = (E._points_df(spark, SF_DIR, "supplier", ("s_suppkey",))
               .where(F.col("s_suppkey") % E._VOR_MOD == 0))
        n_fac = fac.count()
    with t("assign+rollup"):
        got = nearest_facility(pts, fac, fac_id="s_suppkey")
        out = got.groupBy("facility").agg(
            F.count(F.lit(1)).cast("long").alias("n_pts"),
            E._q10_col(F.sum("dist_m")).alias("dist_sum_10m"),
            E._q10_col(F.max("dist_m")).alias("dist_max_10m"))
        _force(out)
    t.phases["n_fac"] = n_fac


def _phases_minhash_cold(spark, t):
    import shutil

    import __spark_entry__ as E

    with t("rm_checkpoint"):
        shutil.rmtree(E._minhash_sig_dir(spark, SF_DIR), ignore_errors=True)
    from projcl_spark.operators.text import minhash_split_sql

    sig_sql, pairs_sql = minhash_split_sql("spark")
    with t("sig_build_write"):
        spark.read.parquet(E._t(SF_DIR, "documents")).repartition(
            spark.sparkContext.defaultParallelism * 2
        ).createOrReplaceTempView("documents")
        d = E._minhash_sig_dir(spark, SF_DIR)
        spark.sql(sig_sql).write.mode("overwrite").parquet(E._fs_url(d))
    with t("pairs_join_force"):
        spark.read.parquet(E._fs_url(d)).createOrReplaceTempView("minhash_sig")
        _force(spark.sql(pairs_sql.replace("__SIG__", "minhash_sig")))


def _phases_adaptive_tiles(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.index.cells import adaptive_tiles, cell_id_col

    ks = ("l_orderkey", "l_linenumber")
    with t("leaf_rollup"):
        pts = E._points_df(spark, SF_DIR, "lineitem", ks)
        leaf = pts.groupBy(
            cell_id_col(F.col("lon"), F.col("lat"), E._QT_RES_MAX).alias("cell_id")
        ).agg(F.count("*").alias("cnt"))
        _force(leaf)
    with t("tiles"):
        _force(adaptive_tiles(leaf, E._QT_RES_MAX, E._QT_RES_MIN,
                              cap_den=E._QT_CAP_DEN))


def _phases_hillshade(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.operators.raster import dem_hillshade

    cpus = spark.sparkContext.defaultParallelism
    w = 1024
    with t("dem_force"):
        dem = (spark.range(w * w)
               .repartition(cpus * 2)
               .select((F.col("id") % w).alias("gi"),
                       (F.col("id") / w).cast("long").alias("gj"))
               .select("gi", "gj", F.expr(E._DEM_ELEV).alias("elev")))
        _force(dem)
    with t("hillshade"):
        _force(dem_hillshade(dem, 30.0, 30.0))


def _phases_stream_geofence(spark, t):
    import __spark_entry__ as E

    with t("full"):
        E.q_stream_geofence(spark, SF_DIR).count()


def _phases_cell_salted(spark, t):
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from projcl_spark.index.cells import cell_id_col
    from projcl_spark.operators.skew import hot_cells, salted_repartition

    with t("pts+cell"):
        lon_e, lat_e = E.O.derived_lonlat(
            E._key("lineitem", ("l_orderkey", "l_linenumber"), "spark"), "spark")
        cpus = spark.sparkContext.defaultParallelism
        pts = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
               .select("l_orderkey", "l_linenumber")
               .repartition(cpus * 2)
               .select("l_orderkey", "l_linenumber",
                       F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat")))
        df = pts.withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), 2))
    with t("hot_detect"):
        hot = hot_cells(df, threshold_ratio=1.0, sample_key="l_orderkey")
    with t("salted_agg"):
        salted = salted_repartition(df, "cell_id", hot, 16, key_col="l_orderkey")
        partial = salted.groupBy("cell_id", "_salt").agg(F.count("*").alias("_n"))
        _force(partial.groupBy("cell_id").agg(F.sum("_n").alias("n")))


def _phases_flow_accum(spark, t):
    import __spark_entry__ as E

    with t("full"):
        _force(E.q_flow_accum(spark, SF_DIR))


def _phases_dbscan(spark, t):
    import __spark_entry__ as E

    with t("full"):
        _force(E.q_dbscan_cells(spark, SF_DIR))


def _phases_hausdorff(spark, t):
    import __spark_entry__ as E

    with t("full"):
        _force(E.q_hausdorff_tracks(spark, SF_DIR))


PHASES = {
    "dedup_clusters": _phases_dedup_clusters,
    "cell_bfs": _phases_cell_bfs,
    "voronoi_assign": _phases_voronoi,
    "dedup_minhash_cold": _phases_minhash_cold,
    "adaptive_tiles": _phases_adaptive_tiles,
    "hillshade": _phases_hillshade,
    "stream_geofence": _phases_stream_geofence,
    "cell_salted": _phases_cell_salted,
    "flow_accum": _phases_flow_accum,
    "dbscan_cells": _phases_dbscan,
    "hausdorff_tracks": _phases_hausdorff,
}


def cmd_phases(arm: str) -> None:
    spark = _spark()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    t = _T()
    spark.sparkContext.setJobDescription(f"phases:{arm}")
    PHASES[arm](spark, t)
    print(json.dumps({"arm": arm, "phases": t.phases}))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "explain":
        suffix = "before"
        if "--suffix" in sys.argv:
            suffix = sys.argv[sys.argv.index("--suffix") + 1]
        cmd_explain(sys.argv[2].split(","), suffix)
    elif cmd == "phases":
        cmd_phases(sys.argv[2])
    elif cmd == "time":
        n = 3
        if "--n" in sys.argv:
            n = int(sys.argv[sys.argv.index("--n") + 1])
        cmd_time(sys.argv[2].split(","), n)
    else:
        raise SystemExit(__doc__)

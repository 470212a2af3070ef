"""Controlled A/B: PIP refine via closure-captured vertices (current
default) vs per-row column vertices (the r1 shape), interleaved rounds in
ONE session so host drift hits both arms equally (the dedup_minhash A/B in
BENCH/BASELINE.md is the model).  Addresses VERDICT r2 "What's wrong #3":
the sf0.1 bench regression (1.46 → 2.16 s) needed a same-session crossover
measurement, not two bench runs hours apart.

Runs two workloads:
  small — the bench `pip_join` shape: sf0.1 lineitem points (~600k) vs the
          24-triangle fixture at PIP_RES;
  large — the scaling shape: 16M synthetic points vs 64 polygons at res 6.

Usage: python tools/pip_ab.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from projcl_spark.index.cells import cell_id_col  # noqa: E402
from projcl_spark.operators.pip import _pip_refine, pip_join  # noqa: E402
from projcl_spark.session import get_spark  # noqa: E402
from projcl_spark.sources.synth import points_fixture, polygons_df  # noqa: E402


def colvert_join(points, polygons, res):
    """The r1 refine shape: vertex arrays broadcast WITH the cover and
    shipped through Arrow per candidate row (~200 B/row)."""
    pts = points.withColumn("cell_id", cell_id_col(F.col("lon"), F.col("lat"), res))
    poly_cells = polygons.select(
        "poly_id", "xs", "ys", F.explode("cells").alias("cell_id")
    )
    cand = pts.join(F.broadcast(poly_cells), "cell_id", how="inner")
    return cand.filter(_pip_refine("lon", "lat", "xs", "ys", "poly_id")).drop(
        "xs", "ys", "cell_id"
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("pip-ab", cores=cpus)

    lon_e, lat_e = E.O.derived_lonlat(
        E._key("lineitem", ("l_orderkey", "l_linenumber"), "spark"), "spark"
    )
    small_pts = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber")
        .repartition(cpus * 2)
        .select("l_orderkey", "l_linenumber",
                F.expr(lon_e).alias("lon"), F.expr(lat_e).alias("lat"))
    )
    tri = E._triangles_df(spark)
    large_pts = points_fixture(spark, 16_000_000, num_partitions=128)
    polys = polygons_df(spark, 64, res=6)

    arms = {
        "small_closure": lambda: _force(pip_join(small_pts, tri, res=E.PIP_RES)),
        "small_colvert": lambda: _force(colvert_join(small_pts, tri, E.PIP_RES)),
        "large_closure": lambda: _force(pip_join(large_pts, polys, res=6)),
        "large_colvert": lambda: _force(colvert_join(large_pts, polys, 6)),
    }
    # warm-up every arm once (JVM/Arrow/broadcast), excluded
    for fn in arms.values():
        fn()
    best: dict[str, float] = {k: float("inf") for k in arms}
    for _ in range(rounds):
        for k, fn in arms.items():  # interleaved: drift hits all arms
            t0 = time.time()
            fn()
            best[k] = min(best[k], time.time() - t0)
    out = {k: round(v, 3) for k, v in best.items()}
    out["small_speedup_closure"] = round(best["small_colvert"] / best["small_closure"], 2)
    out["large_speedup_closure"] = round(best["large_colvert"] / best["large_closure"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

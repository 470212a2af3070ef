"""The flagship interleaved-document pipeline, checkpointed stage by stage.

North-rule shape: every stage commits to the checkpoint store with
per-partition lineage before downstream reads it, so a crashed run resumes
mid-pipeline (tested in tests/test_checkpoint.py::test_flagship_*).

    docs → spans (explode + geo parse) → projected (codegen Albers)
         → pip (broadcast filter-refine) → rollup (per-polygon stats)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.params import ProjectionParams
from ..core.spheroid import Spheroid
from ..functions import project_fwd_cols
from ..operators.pip import pip_join
from ..operators.spans import explode_spans, geo_enrich
from ..sources import synth
from .checkpoint import Pipeline

ALBERS = ProjectionParams(spheroid=Spheroid.WGS_84, rlat1=30.0, rlat2=60.0)


def flagship_pipeline(
    spark: SparkSession,
    root: str,
    run_id: str,
    n_docs: int = 2000,
    n_polys: int = 32,
    res: int = 8,
    hotspot: bool = True,
) -> tuple[Pipeline, DataFrame]:
    """Build + run (or resume) the flagship pipeline; returns (pipeline,
    final rollup DataFrame)."""
    p = Pipeline(spark, root, run_id)

    p.stage("docs", lambda: synth.documents(spark, n_docs, hotspot=hotspot))
    p.stage("spans", lambda docs: geo_enrich(explode_spans(docs)), inputs=("docs",))

    def project(spans: DataFrame) -> DataFrame:
        xc, yc = project_fwd_cols("albers_equal_area", ALBERS)
        return spans.filter(F.col("lon").isNotNull()).select(
            "doc_id", "offset", "lon", "lat", xc, yc
        )

    p.stage("projected", project, inputs=("spans",))

    def pip(projected: DataFrame) -> DataFrame:
        polys = synth.polygons_df(spark, n_polys, res=res)
        return pip_join(projected, polys, res=res)

    p.stage("pip", pip, inputs=("projected",))

    def rollup(hits: DataFrame) -> DataFrame:
        return hits.groupBy("poly_id").agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.round(F.avg("x"), 3).alias("avg_x"),
        )

    out = p.stage("rollup", rollup, inputs=("pip",))
    return p, out

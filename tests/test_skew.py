"""Skew/salting tests over the hotspot synthetic distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projcl_spark.index.cells import cell_id_col
from projcl_spark.operators.skew import (
    cell_histogram,
    hot_cells,
    salted_repartition,
    skew_aware_cell_agg,
)
from projcl_spark.sources.synth import geo_points

RES = 5


@pytest.fixture(scope="module")
def hotspot_pts(spark):
    return geo_points(spark, 2000, hotspot=True).withColumn(
        "cell_id", cell_id_col(F.col("lon"), F.col("lat"), RES)
    )


def test_hot_cells_detected(hotspot_pts):
    hot = hot_cells(hotspot_pts, threshold_ratio=4.0)
    assert 1 <= len(hot) <= 10  # 3 hotspots, possibly straddling cell edges


def test_salting_spreads_hot_partitions(spark, hotspot_pts):
    hot = hot_cells(hotspot_pts)
    unsalted = hotspot_pts.repartition(32, F.col("cell_id"))
    salted = salted_repartition(hotspot_pts, hot=hot, n_salts=16,
                                key_col="doc_id", num_partitions=32)

    def max_partition_frac(df):
        sizes = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
        total = sum(r["count"] for r in sizes)
        return max(r["count"] for r in sizes) / total

    assert max_partition_frac(salted) < max_partition_frac(unsalted)


def test_salt_deterministic(hotspot_pts):
    hot = hot_cells(hotspot_pts)
    a = salted_repartition(hotspot_pts, hot=hot, key_col="doc_id").select(
        "doc_id", "offset", "_salt"
    )
    b = salted_repartition(hotspot_pts.repartition(7), hot=hot, key_col="doc_id").select(
        "doc_id", "offset", "_salt"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_skew_aware_agg_counts_exact(hotspot_pts):
    got = skew_aware_cell_agg(hotspot_pts, key_col="doc_id")
    exact = hotspot_pts.groupBy("cell_id").agg(F.count("*").alias("n_points"))
    j = got.join(exact.withColumnRenamed("n_points", "n_exact"), "cell_id")
    assert j.filter(F.col("n_points") != F.col("n_exact")).count() == 0
    assert got.count() == exact.count()


def test_sampled_hot_detection_layout_independent(hotspot_pts):
    """Content-hash sampling (sample_key) must pick the same rows — and so
    the same hot set — regardless of partition layout; df.sample would not."""
    a = hot_cells(hotspot_pts, threshold_ratio=1.0,
                  sample_key="doc_id", sample_mod=3)
    b = hot_cells(hotspot_pts.repartition(7), threshold_ratio=1.0,
                  sample_key="doc_id", sample_mod=3)
    assert sorted(a) == sorted(b)
    # the hotspot generator piles ~50% of rows into 3 cells — even a 1/3
    # sample must see them
    full = set(hot_cells(hotspot_pts, threshold_ratio=1.0))
    assert set(a) & full

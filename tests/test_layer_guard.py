"""Layer-collect size guard (the r4 verdict's only 100×-scale hazard):
every driver-side geometry collect must be preceded by a Spark-side size
check that raises — or, for ``pip_join``, degrades to the distributed
cell equi-join plan — instead of silently OOMing the driver on a layer
that outgrew the broadcast envelope."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from projcl_spark.operators import layer_guard as LG
from projcl_spark.operators.layer_guard import (
    LayerTooLargeError,
    check_layer_size,
)
from projcl_spark.operators.pip import (
    build_cell_map,
    build_vert_map,
    clear_vert_cache,
    pip_join,
)
from projcl_spark.sources import synth


def test_check_layer_size_small_layer_passes(spark):
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    n, est = check_layer_size(polys, what="t", size_col="xs")
    assert n == 16 and est > 0


def test_check_layer_size_row_cap(spark):
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    with pytest.raises(LayerTooLargeError, match="16 rows"):
        check_layer_size(polys, what="t", size_col="xs", max_rows=4)


def test_check_layer_size_byte_cap(spark):
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    with pytest.raises(LayerTooLargeError, match="payload"):
        check_layer_size(polys, what="t", size_col="xs", max_bytes=64)


def test_build_maps_guarded(spark, monkeypatch):
    """Both closure-map builders refuse an over-cap layer BEFORE any
    collect (module caps are read at call time, so deployments can
    retune them globally)."""
    monkeypatch.setattr(LG, "MAX_LAYER_ROWS", 4)
    clear_vert_cache()
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    with pytest.raises(LayerTooLargeError):
        build_vert_map(polys)
    with pytest.raises(LayerTooLargeError):
        build_cell_map(polys)


def test_pip_join_falls_back_to_equi_join(spark, monkeypatch):
    """Over-cap layer: pip_join warns and degrades to the shuffle plan,
    returning exactly the broadcast plan's rows."""
    pts = synth.geo_points(spark, 200)
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    clear_vert_cache()
    expected = pip_join(pts, polys, res=8).select(
        "doc_id", "offset", "poly_id")
    monkeypatch.setattr(LG, "MAX_LAYER_ROWS", 4)
    clear_vert_cache()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = pip_join(pts, polys, res=8).select(
            "doc_id", "offset", "poly_id")
        rows = got.collect()
    assert any("falling back" in str(x.message) for x in w)
    assert len(rows) == expected.count()
    assert got.exceptAll(expected).count() == 0
    clear_vert_cache()  # don't leave the poisoned-cap layer memo behind


def test_boundary_and_snap_guarded(spark, monkeypatch):
    from projcl_spark.operators.geometry import (
        distance_to_boundary,
        snap_to_segments,
    )

    monkeypatch.setattr(LG, "MAX_LAYER_ROWS", 4)
    pts = synth.geo_points(spark, 50)
    polys = synth.polygons_df(spark, n_polys=16, res=8)
    with pytest.raises(LayerTooLargeError):
        distance_to_boundary(pts, polys).count()
    segs = spark.createDataFrame(
        [(i, 0.0 + i, 0.0, 1.0 + i, 1.0) for i in range(8)],
        "seg_id long, x1 double, y1 double, x2 double, y2 double",
    )
    with pytest.raises(LayerTooLargeError):
        snap_to_segments(pts, segs).count()

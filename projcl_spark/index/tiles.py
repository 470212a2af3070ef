"""Slippy-map (z/x/y) Web-Mercator tiling — the web-map serving address
scheme.

The reference computes the Mercator forward transform
(kernel/pl_project_mercator.opencl:24-36) but stops at projected meters;
an analytics/tiling engine must also ADDRESS the output — assign every
point a (zoom, tile_x, tile_y) plus an in-tile pixel, then aggregate per
tile, because that is the unit a tile server renders and caches.

Scale shape: tile assignment is pure whole-stage codegen (zero shuffle —
the expression text comes from ``oracle.slippy_global_px`` so the DuckDB
twin is bit-identical); the per-tile rollup is ONE map-side-combinable
groupBy whose exchange moves pre-aggregated tile rows, not points.  At
100 TB the hot keys are the dense city tiles — the same two-phase salted
pattern as ``operators.skew`` applies unchanged if a tile exceeds a
partition, but the default plan is already the one you'd want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle as O


def tile_assign(
    df: DataFrame,
    zoom: int = 7,
    lon: str = "lon",
    lat: str = "lat",
    tile_px: int = 256,
) -> DataFrame:
    """Add slippy tile + pixel columns: (tx, ty, px, py) at ``zoom``.

    Tile and pixel derive from a single global-pixel floor() each, so
    they are exactly consistent; poles and the antimeridian clamp into
    the edge tiles per the slippy standard.
    """
    gx_e, gy_e = O.slippy_global_px(lon, lat, zoom, tile_px)
    gx, gy = F.expr(gx_e), F.expr(gy_e)
    return df.withColumns(
        {
            "tx": F.floor(gx / tile_px).cast("long"),
            "ty": F.floor(gy / tile_px).cast("long"),
            "px": (gx % tile_px).cast("long"),
            "py": (gy % tile_px).cast("long"),
        }
    )


def tile_rollup(
    df: DataFrame,
    zoom: int = 7,
    lon: str = "lon",
    lat: str = "lat",
    tile_px: int = 256,
) -> DataFrame:
    """Per-tile point rollup: (tx, ty, n_pts, sum_px, sum_py).

    The pixel sums are exact integer arithmetic (no float accumulation),
    so the result is bit-reproducible at any parallelism — and they are
    what a renderer needs for a centroid marker (sum/n) without a second
    pass.
    """
    t = tile_assign(df, zoom, lon, lat, tile_px)
    return t.groupBy("tx", "ty").agg(
        F.count("*").alias("n_pts"),
        F.sum("px").alias("sum_px"),
        F.sum("py").alias("sum_py"),
    )


def with_quadkey(
    df: DataFrame,
    zoom: int = 6,
    lon: str = "lon",
    lat: str = "lat",
    out: str = "qk",
) -> DataFrame:
    """Add the Bing-maps quadkey string for each point's slippy tile at
    ``zoom`` (``oracle.quadkey_sql``): pure whole-stage codegen, zero
    shuffle, zero UDFs.  ``substring(qk, 1, k)`` is the zoom-k ancestor
    tile — the prefix property tile caches and pyramid rollups key on,
    so coarsening never needs a re-encode.
    """
    gx_e, gy_e = O.slippy_global_px(lon, lat, zoom, tile_px=1)
    # stage tile coords once: the quadkey text references tx/ty 2·zoom
    # times, and staged plain columns keep the plan (and the SQL twin)
    # linear in zoom instead of quadratic
    staged = df.withColumns({"_qtx": F.expr(gx_e), "_qty": F.expr(gy_e)})
    return (staged
            .withColumn(out, F.expr(O.quadkey_sql("_qtx", "_qty", zoom)))
            .drop("_qtx", "_qty"))

"""Deterministic synthetic inputs (FIXTURES.md schemas).

Everything is a pure function of (seed, row index) — generated with Spark
column expressions (md5-based hashing), so two runs at ANY parallelism
produce identical tables and generation itself scales to 10^12 rows (no
driver-side data, no numpy RNG on executors).  Mirrors the reference's
no-data-files fixture philosophy (``/root/reference/test/projcl_test.c:
460-467``).

The md5→bigint trick (``conv(substr(md5(k),1,15),16,10)``) is chosen because
DuckDB can evaluate the identical expression, keeping oracle SQL and engine
bit-for-bit comparable.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index import cells as cellmod

U60 = float(1 << 60)  # md5-15-hex-digit hash range

# test envelope (reference grid: lon ∈ [-60, 60], lat ∈ [-40, 80] — chosen
# for conic/TM validity, projcl_test.c:31-35)
LON_MIN, LON_MAX = -60.0, 60.0
LAT_MIN, LAT_MAX = -40.0, 80.0

# dense hotspot centers for skew exercises (lon, lat)
HOTSPOTS = ((10.0, 48.0), (-30.0, 20.0), (40.0, -10.0))


def _h(key: str | F.Column, salt: str) -> F.Column:
    """Deterministic uniform bigint in [0, 2^60) from (key, salt)."""
    k = F.concat(F.lit(salt + ":"), key if isinstance(key, F.Column) else F.lit(key))
    return F.conv(F.substring(F.md5(k), 1, 15), 16, 10).cast("long")


def _u(key, salt: str) -> F.Column:
    """Uniform double in [0, 1)."""
    return _h(key, salt) / F.lit(U60)


def documents(spark: SparkSession, n_docs: int, hotspot: bool = False) -> DataFrame:
    """Interleaved text+media documents (the driver's input hint shape).

    Schema: (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
    1–8 spans per doc; kind ∈ {text, image, video, geo}; geo spans carry
    'lon,lat' in text (derived deterministically from (doc_id, offset)).
    ``hotspot=True`` concentrates ~50% of geo points into 3 small cells to
    exercise the skew/salting paths.
    """
    df = spark.range(n_docs).select(
        F.format_string("doc%012d", F.col("id")).alias("doc_id")
    )
    n_spans = (_h(F.col("doc_id"), "nspans") % 8 + 1).cast("int")

    def mk_span(i: F.Column) -> F.Column:
        key = F.concat(F.col("doc_id"), F.lit("#"), i.cast("string"))
        kind_idx = _h(key, "kind") % 4
        kind = (
            F.when(kind_idx == 0, "text")
            .when(kind_idx == 1, "image")
            .when(kind_idx == 2, "video")
            .otherwise("geo")
        )
        u1, u2, u3 = _u(key, "u1"), _u(key, "u2"), _u(key, "u3")
        lon = F.lit(LON_MIN) + (F.lit(LON_MAX) - F.lit(LON_MIN)) * u1
        lat = F.lit(LAT_MIN) + (F.lit(LAT_MAX) - F.lit(LAT_MIN)) * u2
        if hotspot:
            hot = _h(key, "hot") % 2 == 0
            which = (_h(key, "which") % len(HOTSPOTS)).cast("int")
            hx = F.element_at(
                F.array(*[F.lit(h[0]) for h in HOTSPOTS]), which + 1
            )
            hy = F.element_at(
                F.array(*[F.lit(h[1]) for h in HOTSPOTS]), which + 1
            )
            lon = F.when(hot, hx + (u1 - 0.5) * 0.5).otherwise(lon)
            lat = F.when(hot, hy + (u2 - 0.5) * 0.5).otherwise(lat)
        geo_text = F.format_string("%.9f,%.9f", lon, lat)
        word = F.concat(F.lit("tok"), (_h(key, "w") % 1000).cast("string"))
        text = (
            F.when(kind == "text", word).when(kind == "geo", geo_text).otherwise(F.lit(None))
        )
        media_ref = F.when(
            kind.isin("image", "video"),
            F.concat(F.lit("m://"), F.substring(F.md5(key), 1, 16)),
        ).otherwise(F.lit(None))
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            i.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), mk_span)
    return df.select("doc_id", spans.alias("spans"))


def geo_points(spark: SparkSession, n_docs: int, hotspot: bool = False) -> DataFrame:
    """Exploded geo spans: (doc_id, offset, lon, lat) — the PIP/kNN input."""
    docs = documents(spark, n_docs, hotspot=hotspot)
    sp = docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
    geo = sp.filter(F.col("span.kind") == "geo")
    parts = F.split(F.col("span.text"), ",")
    # F.get (NULL past the end) + try_cast, not getItem/cast: Catalyst may
    # collapse a caller's filter into this projection and evaluate it
    # before the kind == 'geo' predicate, and non-geo span texts are not
    # "lon,lat" — under ANSI mode getItem(1) throws INVALID_ARRAY_INDEX
    # and cast throws CAST_INVALID_INPUT on those rows
    return geo.select(
        "doc_id",
        F.col("span.offset").alias("offset"),
        F.get(parts, 0).try_cast("double").alias("lon"),
        F.get(parts, 1).try_cast("double").alias("lat"),
    )


def points_fixture(spark: SparkSession, n: int = 200_000,
                   num_partitions: int | None = None) -> DataFrame:
    """The reference benchmark fixture: half 500-wide grid, half circle.

    Recipe from ``test/projcl_test.c:460-467`` (grid over the test envelope,
    circle of radius 40°), generated distributed from ``spark.range``.
    ``num_partitions`` pins the input layout independently of cluster size
    (a real table's file count doesn't change when executors are added) —
    shuffle-free, unlike a repartition.
    """
    half = n // 2
    if half < 1000:
        raise ValueError("points_fixture needs n >= 2000 (grid is 500 wide)")
    kw = {"numPartitions": num_partitions} if num_partitions else {}
    grid = spark.range(0, half, 1, **kw).select(
        F.col("id").alias("pid"),
        (F.lit(LON_MIN) + (F.lit(LON_MAX) - F.lit(LON_MIN)) * (F.col("id") % 500) / 499.0).alias("lon"),
        (F.lit(LAT_MIN) + (F.lit(LAT_MAX) - F.lit(LAT_MIN)) * F.floor(F.col("id") / 500) / ((half / 500) - 1)).alias("lat"),
    )
    circle = spark.range(0, half, 1, **kw).select(
        (F.col("id") + half).alias("pid"),
        (-40.0 * F.cos(F.lit(2 * math.pi) * F.col("id") / (half - 1))).alias("lon"),
        (-40.0 * F.sin(F.lit(2 * math.pi) * F.col("id") / (half - 1))).alias("lat"),
    )
    return grid.unionAll(circle)


# --------------------------------------------------------------- polygons ---

def polygon_layer_np(n_polys: int = 64, seed: int = 42) -> list[dict]:
    """Small deterministic convex-polygon layer (driver-side numpy).

    Centers on a jittered grid over the envelope, 5–12 vertices at radii
    0.5–3°.  Returns dicts {poly_id, xs, ys} (closed rings implied).
    """
    rng = np.random.default_rng(seed)
    side = int(math.ceil(math.sqrt(n_polys)))
    out = []
    for p in range(n_polys):
        gx, gy = p % side, p // side
        cx = LON_MIN + (gx + 0.5 + 0.4 * (rng.random() - 0.5)) / side * (LON_MAX - LON_MIN)
        cy = LAT_MIN + (gy + 0.5 + 0.4 * (rng.random() - 0.5)) / side * (LAT_MAX - LAT_MIN)
        nv = int(rng.integers(5, 13))
        radius = 0.5 + 2.5 * rng.random()
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        out.append(
            {
                "poly_id": p,
                "xs": (cx + radius * np.cos(ang)),
                "ys": (cy + radius * np.sin(ang) * 0.8),
            }
        )
    return out


def polygon_cover_cells(poly: dict, res: int) -> np.ndarray:
    """Conservative cell cover: all cells intersecting the polygon bbox.

    Longitude WRAPS: a seam-crossing polygon (vertices in a CONTINUOUS
    frame, e.g. xs 176…184 — see ``pip.winding_contains_np``) covers the
    cells on both sides of ±180° (ix modulo 2^res, matching
    ``index.cells.neighbors_np``); latitude clips as before."""
    n = 1 << res
    xs, ys = np.asarray(poly["xs"], dtype=np.float64), np.asarray(poly["ys"], dtype=np.float64)
    # raw (unclipped) ix span of the continuous-frame bbox, then wrap
    ix0 = int(np.floor((xs.min() + 180.0) / 360.0 * n))
    ix1 = int(np.floor((xs.max() + 180.0) / 360.0 * n))
    gx_range = np.arange(ix0, ix1 + 1) % n
    _, iy0 = cellmod.cell_xy_np(0.0, ys.min(), res)
    _, iy1 = cellmod.cell_xy_np(0.0, ys.max(), res)
    gx, gy = np.meshgrid(gx_range, np.arange(iy0, iy1 + 1), indexing="ij")
    return np.unique((gx * n + gy).ravel().astype(np.int64))


def seam_polygon_layer_np(n_polys: int = 4, seed: int = 7) -> list[dict]:
    """Deterministic polygons STRADDLING ±180°, in the continuous-frame
    convention (vertex lons around 180, e.g. 176…184 — the winding test
    and cell cover wrap them; see ``pip.winding_contains_np``).  poly_id
    starts at 1000 so layers can be mixed with ``polygon_layer_np``."""
    rng = np.random.default_rng(seed)
    out = []
    for p in range(n_polys):
        cx = 180.0 + 4.0 * (rng.random() - 0.5)           # 178…182
        cy = -60.0 + 120.0 * (p + 0.5) / n_polys           # spread in lat
        nv = int(rng.integers(5, 13))
        radius = 1.0 + 2.0 * rng.random()
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        out.append({
            "poly_id": 1000 + p,
            "xs": (cx + radius * np.cos(ang)),
            "ys": (cy + radius * np.sin(ang) * 0.8),
        })
    return out


def seam_polygons_df(spark: SparkSession, n_polys: int = 4, seed: int = 7,
                     res: int = 8) -> DataFrame:
    """Seam-straddling polygon layer as a DataFrame (wrapped cell covers)."""
    layer = seam_polygon_layer_np(n_polys, seed)
    rows = [
        (p["poly_id"], [float(v) for v in p["xs"]], [float(v) for v in p["ys"]],
         [int(c) for c in polygon_cover_cells(p, res)])
        for p in layer
    ]
    return spark.createDataFrame(
        rows, "poly_id long, xs array<double>, ys array<double>, cells array<long>"
    )


# memoized per (session, params): createDataFrame mints fresh expression
# ids per call, so two structurally identical local-relation plans get
# DIFFERENT semanticHashes — returning the same DataFrame object keeps
# pip's vert/cell-map memos hitting across gate queries and bench
# iterations instead of re-running the layer_guard aggregate + collect
# per call (same discipline as __spark_entry__._triangles_df)
_POLY_DF_CACHE: dict[tuple, DataFrame] = {}


def polygons_df(spark: SparkSession, n_polys: int = 64, seed: int = 42, res: int = 8) -> DataFrame:
    """Polygon layer as a DataFrame: (poly_id, xs, ys, cells at ``res``)."""
    key = (spark.sparkContext.applicationId, n_polys, seed, res)
    if key not in _POLY_DF_CACHE:
        layer = polygon_layer_np(n_polys, seed)
        rows = [
            (
                p["poly_id"],
                [float(v) for v in p["xs"]],
                [float(v) for v in p["ys"]],
                [int(c) for c in polygon_cover_cells(p, res)],
            )
            for p in layer
        ]
        if len(_POLY_DF_CACHE) > 8:  # one live session; a handful of params
            _POLY_DF_CACHE.clear()
        _POLY_DF_CACHE[key] = spark.createDataFrame(
            rows, "poly_id long, xs array<double>, ys array<double>, cells array<long>"
        )
    return _POLY_DF_CACHE[key]


# ------------------------------------------------------------------ tiles ---

def pixel_value(px: F.Column, py: F.Column, channel: int = 0) -> F.Column:
    """Deterministic pixel intensity as a pure function of GLOBAL image
    coordinates: gradient + md5 noise, in [0, 255].

    Because the value depends only on (px, py[, channel]) — not on the tile
    layout — a DuckDB oracle can verify any tiled-sampling result
    analytically without reconstructing the tile table (see
    ``oracle.pixel_sql``).  ``channel=0`` is byte-identical to the
    historical single-band formula; channels 1+ salt the noise key and
    shift the gradient so bands are decorrelated (the reference's float4
    RGBA semantics, ``kernel/pl_sample_nearest.opencl:15,40``).
    """
    salt = "px:" if channel == 0 else f"px{channel}:"
    key = F.concat(F.lit(salt), px.cast("string"), F.lit(":"), py.cast("string"))
    noise = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % 32
    return ((px * 3 + py * 7 + F.lit(channel * 11) + noise) % 256).cast("int")


def tiles_df(
    spark: SparkSession,
    tiles_across: int = 4,
    tiles_down: int = 4,
    width: int = 64,
    height: int = 64,
    channels: int = 1,
) -> DataFrame:
    """Raster tile table mirroring ``PLImageArrayBuffer``
    (``include/projcl/projcl_warp.h:22-28``): one row per tile,
    tile_id = row·across + col (row-first, projcl_warp.h:51-52), pixels =
    row-major ints from ``pixel_value`` over global coordinates.

    ``channels=1`` (default) keeps the historical single-band schema
    (``pixels``).  ``channels=N`` adds ``pixels_1 … pixels_{N-1}`` — the
    reference's float4 RGBA image layout (channel order/type are load
    parameters there, ``src/projcl_warp.c:68-82``) expressed as per-band
    array columns, so the gather join reads all bands from ONE tile row.
    """
    t = spark.range(tiles_across * tiles_down).select(
        F.col("id").alias("tile_id"),
        (F.col("id") / tiles_across).cast("int").alias("tile_row"),
        (F.col("id") % tiles_across).cast("int").alias("tile_col"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
    )
    def _band(c: int) -> F.Column:
        # NB: F.transform inspects the lambda's arity — a second default
        # argument would be bound to the ELEMENT INDEX, so the channel must
        # be captured via this factory closure instead
        def px_at(i: F.Column) -> F.Column:
            return pixel_value(
                (F.col("tile_col") * width + i % width).cast("long"),
                (F.col("tile_row") * height + F.floor(i / width)).cast("long"),
                channel=c,
            )

        return F.transform(F.sequence(F.lit(0), F.lit(width * height - 1)), px_at)

    band_cols = [
        _band(c).alias("pixels" if c == 0 else f"pixels_{c}") for c in range(channels)
    ]
    return t.select("tile_id", "tile_row", "tile_col", "width", "height", *band_cols)

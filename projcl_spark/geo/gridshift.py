"""Grid-based datum shift (NADCON/NTv2 style): bilinear interpolation of
a correction grid at scattered points.

The reference shifts datums through 7-parameter Helmert matrices
(``src/projcl_datum.c`` — mirrored in ``geo/datum.py``); national
re-adjustments (NAD27→NAD83, AGD→GDA) instead publish CORRECTION GRIDS
(arc-second offsets at regular lon/lat nodes) that are bilinearly
interpolated at each point.  This module is that operator with the grid
as DATA — the real-world seam is "load the .gsb/.los grid into a
DataFrame"; tests and the driver gate use a deterministic synthetic grid
(hash-derived node offsets) both engines generate from ONE shared text.

Plan shape (the 100-TB story): the grid is tiny (a national NTv2 file is
a few MB) and the four corner lookups are BROADCAST hash joins — the
point side never shuffles; all index/fraction/blend math is dialect-free
staged codegen shared with the DuckDB oracle.  Out-of-grid points clamp
to the edge cell (the published NADCON convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import _r, hash60

# synthetic-grid node offsets: integer milli-arc-seconds in ±1000, exact
# in float64 on both engines
_NODE_MOD = 2001


def node_offset_sql(comp: str, i: str, j: str, dialect: str) -> str:
    """Deterministic node offset (arc-seconds, ±1.0) for component
    ``comp`` ('e'|'n') at grid indices (i, j) — the shared synthetic-grid
    text (both engines accept the STRING cast alias)."""
    key = f"'gs:{comp}:' || CAST({i} AS STRING) || ':' || CAST({j} AS STRING)"
    return f"(CAST(({hash60(key, dialect)} % {_NODE_MOD}) - 1000 AS DOUBLE) / 1000.0)"


def index_stage_sql(lon: str, lat: str, lon0: float, lat0: float,
                    step: float, nx: int, ny: int) -> dict[str, str]:
    """Cell indices + in-cell fractions, edge-clamped (dialect-free).
    ``nx``/``ny`` are NODE counts; the last addressable cell is n−2."""
    gi = f"least(greatest(floor(({lon} - {_r(lon0)}) / {_r(step)}), 0.0), {nx - 2}.0)"
    gj = f"least(greatest(floor(({lat} - {_r(lat0)}) / {_r(step)}), 0.0), {ny - 2}.0)"
    # fractions clamp to [0, 1] too: outside the grid the shift pins to
    # the edge VALUE (no extrapolation) — the conservative convention
    fx = f"(({lon} - {_r(lon0)}) / {_r(step)} - ({gi}))"
    fy = f"(({lat} - {_r(lat0)}) / {_r(step)} - ({gj}))"
    return {
        "gi": f"CAST({gi} AS BIGINT)",
        "gj": f"CAST({gj} AS BIGINT)",
        "fx": f"least(greatest({fx}, 0.0), 1.0)",
        "fy": f"least(greatest({fy}, 0.0), 1.0)",
    }


# corner columns are named {comp}{dx}{dy}; ONE blend text keeps the float
# operation order identical on both engines
def blend_sql(comp: str) -> str:
    return (f"((1.0 - fx) * (1.0 - fy) * {comp}00 + fx * (1.0 - fy) * {comp}10"
            f" + (1.0 - fx) * fy * {comp}01 + fx * fy * {comp}11)")


def synthetic_grid(spark: SparkSession, nx: int, ny: int) -> DataFrame:
    """The deterministic test grid: (i, j, de_as, dn_as) — arc-second
    offsets at each node, matching the oracle's generated grid exactly."""
    return (spark.range(nx * ny)
            .select((F.col("id") % nx).cast("long").alias("i"),
                    (F.col("id") / nx).cast("long").alias("j"))
            .select("i", "j",
                    F.expr(node_offset_sql("e", "i", "j", "spark")).alias("de_as"),
                    F.expr(node_offset_sql("n", "i", "j", "spark")).alias("dn_as")))


def grid_shift(points: DataFrame, grid: DataFrame, *,
               lon0: float, lat0: float, step: float, nx: int, ny: int,
               lon: str = "lon", lat: str = "lat") -> DataFrame:
    """``points`` + (``slon``, ``slat``): coordinates shifted by the
    bilinearly interpolated grid offsets (grid units: arc-seconds).

    Four BROADCAST equi-joins fetch the cell corners — zero shuffle on
    the point side; everything else is whole-stage codegen."""
    df = points.withColumns({
        k: F.expr(t)
        for k, t in index_stage_sql(lon, lat, lon0, lat0, step, nx, ny).items()
    })
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        tag = f"{dx}{dy}"
        g = F.broadcast(grid.select(
            F.col("i").alias(f"i{tag}"), F.col("j").alias(f"j{tag}"),
            F.col("de_as").alias(f"e{tag}"), F.col("dn_as").alias(f"n{tag}")))
        df = df.join(
            g, (F.col(f"i{tag}") == F.col("gi") + dx)
               & (F.col(f"j{tag}") == F.col("gj") + dy), "left"
        ).drop(f"i{tag}", f"j{tag}")
    return (df
            .withColumn("slon", F.col(lon) + F.expr(blend_sql("e")) / 3600.0)
            .withColumn("slat", F.col(lat) + F.expr(blend_sql("n")) / 3600.0)
            .drop("gi", "gj", "fx", "fy",
                  *[f"{c}{dx}{dy}" for c in "en"
                    for dx in (0, 1) for dy in (0, 1)]))

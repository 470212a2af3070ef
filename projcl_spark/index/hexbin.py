"""Hexagonal binning (pointy-top axial grid, cube rounding) — the
hex-density aggregation layer every geo dashboard offers.

Engine-added: the reference (/root/reference) projects and samples but
has no spatial binning; hexagons are the standard choice over squares
because every neighbor shares an edge and distances to neighboring bin
centers are uniform, so density reads without the diagonal artifacts of
a square grid.

Scale shape: bin assignment is pure whole-stage codegen from
``oracle.hexbin_stages`` (the SAME staged text feeds the DuckDB oracle
twin), zero UDFs, zero shuffle; the per-bin rollup is one
map-side-combinable groupBy whose exchange moves pre-aggregated bin
rows, not points.  Skewed city bins at 100 TB take the two-phase salted
pattern of ``operators.skew`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle as O


def with_hexbin(
    df: DataFrame,
    size_deg: float = 3.0,
    lon: str = "lon",
    lat: str = "lat",
    q: str = "hq",
    r: str = "hr",
) -> DataFrame:
    """Add the axial hex-cell address (``hq``, ``hr``) for each point.

    ``size_deg`` is the hex center-to-vertex size in degrees of the
    plate-carrée frame.  The fractional axial coords are staged as plain
    columns once, so the cube-rounding CASEs reference columns instead of
    re-inlining the trig — keeping the plan linear, exactly like the
    DuckDB twin's CTE stages.
    """
    g = O.hexbin_stages(size_deg)
    staged = df.withColumns({
        "_hqf": F.expr(g["qf"].format(x=lon, y=lat)),
        "_hrf": F.expr(g["rf"].format(x=lon, y=lat)),
    })
    return (staged
            .withColumns({
                q: F.expr(g["hq"].format(qf="_hqf", rf="_hrf")),
                r: F.expr(g["hr"].format(qf="_hqf", rf="_hrf")),
            })
            .drop("_hqf", "_hrf"))


def hex_rollup(
    df: DataFrame,
    size_deg: float = 3.0,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-hex point rollup: (hq, hr, n_pts) — one partial-agg exchange."""
    return (with_hexbin(df, size_deg, lon, lat)
            .groupBy("hq", "hr")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pts")))

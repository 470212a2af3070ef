"""Polygon metrics — planar area / perimeter / centroid after projection.

The reference projects geometry but never measures it; measuring is what
an analytics engine does with the projected coordinates.  This operator
composes the engine's closed-form forward projections (JVM codegen, the
same constant-folded transliteration the oracles use — pick an
equal-area projection like Albers and the planar area IS the on-earth
area) with the shoelace formulas over a DISTRIBUTED vertex table
(poly_id, v_idx, lon, lat): at 100 TB a polygon corpus arrives exploded,
one row per vertex, and must never be collected.

Plan shape: project each vertex (pure map) → cyclic successor via ONE
lead/first window on poly_id → per-polygon aggregate that reuses the
window's hash partitioning (same single-key-exchange discipline as
``trajectory.track_stats``).  Determinism: vertex order is the stored
ring order (``v_idx``), so every term of every sum is fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import project_fwd_cols


def polygon_metrics(
    verts: DataFrame,
    proj: str = "albers_equal_area",
    params=None,
    poly_id: str = "poly_id",
    v_idx: str = "v_idx",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Per-polygon planar metrics in projected meters.

    ``verts`` holds one row per ring vertex in ring order (closure edge
    implied: last vertex connects back to the first).  Returns
    (poly_id, n_verts, area_m2, perim_m, cx, cy) with the signed shoelace
    area folded to absolute (either ring orientation measures the same).

    With ``params=None`` the default is ellipsoidal Albers with the
    classic 29.5/45.5 standard parallels — a conic projection cannot
    prepare without parallels, so the bare-call path needs a real default.
    """
    if params is None:
        from ..core.params import ProjectionParams
        from ..core.spheroid import Spheroid

        params = ProjectionParams(spheroid=Spheroid.WGS_84,
                                  rlat1=29.5, rlat2=45.5)
    xc, yc = project_fwd_cols(proj, params, lon=lon, lat=lat)
    p = verts.select(poly_id, v_idx, xc, yc)
    w = Window.partitionBy(poly_id).orderBy(F.col(v_idx).asc())
    wall = Window.partitionBy(poly_id).orderBy(F.col(v_idx).asc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # cyclic successor: lead() everywhere, first() closes the ring
    nx = F.coalesce(F.lead("x").over(w), F.first("x").over(wall))
    ny = F.coalesce(F.lead("y").over(w), F.first("y").over(wall))
    e = p.select(
        poly_id,
        F.col("x"), F.col("y"), nx.alias("nx"), ny.alias("ny"),
        (F.col("x") * ny - nx * F.col("y")).alias("cross"),
    )
    agg = e.groupBy(poly_id).agg(
        F.count("*").alias("n_verts"),
        (F.sum("cross") / 2.0).alias("_signed"),
        F.sum(F.sqrt((F.col("nx") - F.col("x")) ** 2
                     + (F.col("ny") - F.col("y")) ** 2)).alias("perim_m"),
        F.sum((F.col("x") + F.col("nx")) * F.col("cross")).alias("_sx"),
        F.sum((F.col("y") + F.col("ny")) * F.col("cross")).alias("_sy"),
    )
    return agg.select(
        poly_id,
        "n_verts",
        F.abs(F.col("_signed")).alias("area_m2"),
        "perim_m",
        (F.col("_sx") / (6.0 * F.col("_signed"))).alias("cx"),
        (F.col("_sy") / (6.0 * F.col("_signed"))).alias("cy"),
    )

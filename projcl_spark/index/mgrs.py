"""MGRS grid-reference addressing.

The reference projects to Transverse-Mercator meters
(``kernel/pl_project_transverse_mercator.opencl``) and stops; MGRS is the
standard way those meters are exchanged as grid ADDRESSES (geohash and
quadkey cover the web stacks — ``index/geohash.py``, ``index/tiles.py`` —
MGRS covers the surveying/NATO stack).  Encoding is pure staged codegen:
the UTM auto-zone stages (``oracle.utm_stages``) followed by the MGRS
letter/digit stages (``oracle.mgrs_stages``), zero UDFs; the SAME text is
the DuckDB oracle.

Scale: per-row map work only — no shuffle; grid-square rollups downstream
are map-side combinable, and the 100-km-square prefix is a natural
partition/cluster key for sinks (same role Z-order cells play in
``plans/spatial_sink.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle as O


def with_mgrs(df: DataFrame, lon: str = "lon", lat: str = "lat",
              km_digits: int = 2, out: str = "mgrs") -> DataFrame:
    """Append UTM auto-zone columns (``zone``, ``utm_x``, ``utm_y``) and
    the MGRS reference string (``km_digits`` digits per axis; 2 → 1 km).

    Valid for latitudes in the MGRS envelope (−80…84°; the UTM series
    itself is the constraint) — callers filter polar rows first."""
    for stage in O.utm_stages(lon, lat):
        df = df.withColumns({k: F.expr(t) for k, t in stage.items()})
    for stage in O.mgrs_stages("zone", "utm_x", "utm_y", lat,
                               km_digits=km_digits):
        df = df.withColumns({k: F.expr(t) for k, t in stage.items()})
    df = df.drop("m_e1", "m_n1", "m_ed", "m_nd")  # keep m_band/m_sq for rollups
    return df.withColumnRenamed("mgrs", out) if out != "mgrs" else df

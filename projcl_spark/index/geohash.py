"""Geohash addressing — engine-added.

The interoperable STRING cell key (base32 Morton code, lon bit leading)
every external geo system understands — the export format for handing
the engine's cell index to databases, ElasticSearch-style consumers, or
partner feeds.  Complements the engine's integer Z-order/Hilbert index
(``index.cells`` / ``index.hilbert``): same space-filling-curve locality,
prefix-truncation = coarsening, but as a human-portable string.

Implementation: the dialect-free staged SQL fragments from
``oracle.geohash_stages`` (pure integer floor/mod in float64 < 2^53 —
exact — plus substr/concat), staged through intermediate columns so the
bin/interleave subexpressions evaluate once per row; every stage is
whole-stage-codegen JVM arithmetic, zero UDFs, zero shuffles.  Verified
against the classic published vectors (u4pruydqqvj, ezs42) in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle as O


def with_geohash(df: DataFrame, lon: str = "lon", lat: str = "lat",
                 precision: int = 5, out: str = "gh") -> DataFrame:
    """Append the ``precision``-character geohash of (``lon``, ``lat``)."""
    g = O.geohash_stages(precision)
    return (
        df.withColumn("_gh_lonv", F.expr(g["lonv"].format(lon=lon)))
        .withColumn("_gh_latv", F.expr(g["latv"].format(lat=lat)))
        .withColumn(out, F.expr(g["gh"].format(lonv="_gh_lonv",
                                               latv="_gh_latv")))
        .drop("_gh_lonv", "_gh_latv")
    )

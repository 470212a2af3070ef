"""Nearest-facility (Voronoi) allocation: assign every point to its
closest facility from a SMALL facility layer.

Engine-added (the reference computes point-to-point geodesic matrices,
``src/projcl_run.c:654-656``, but has no assignment/allocation operator);
this is the site-selection / catchment primitive: billions of demand
points, a few hundred depots.

Plan shape (the 100-TB story): the facility layer is captured ONCE into
the refine UDF's closure (guarded by ``layer_guard``) and the argmin runs
as a vectorized numpy matrix sweep over Arrow batches — the same
closure-broadcast discipline as ``operators.pip``'s winding refine.  Only
(lon, lat) cross the Python boundary per row; the big side never shuffles
for the assignment; the only exchange is the per-facility rollup the
caller adds, which is map-side combinable.  Facilities are processed in
fixed-size chunks so the per-batch distance matrix is bounded
(batch × 256 float64 ≈ 134 MB at the 65536-row Arrow batch), making the
K = 4096 cap about closure size, not generated-code size.  (Two prior
JVM-side shapes measured slower at sf0.1/local[32], K = 143: the
higher-order ``aggregate`` fold is a CodegenFallback expression —
interpreted per element, haversine evaluated in both branches of its
``when`` — at ~3.1 s, and a K-ary ``least()`` over (dist, id) structs
blew up optimizer/codegen time to ~7 s; the numpy sweep runs the arm in
~1.4 s and is the guide-§4.2 shape that scales.)

For facility sets beyond the cap, ``knn_join`` (cell-ring k=1) is the
distributed fallback — same semantics, shuffle-based.

Determinism: the within-chunk ``argmin`` keeps the FIRST minimum and the
cross-chunk update uses strict ``<`` over the id-ascending facility
array, so exact ties resolve to the smallest id — identical to the
oracle's ``ORDER BY dist, id`` rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .layer_guard import check_layer_size

# facility-count envelope: the layer is captured into the UDF closure and
# shipped with every task, so the cap is about closure/broadcast size and
# per-batch matrix memory, not driver memory
MAX_FOLD_FACILITIES = 4096
# facilities per vectorized chunk — bounds the per-batch distance matrix
_FAC_CHUNK = 256


def nearest_facility(
    points: DataFrame,
    facilities: DataFrame,
    *,
    fac_id: str = "fac_id",
    fac_lon: str = "lon",
    fac_lat: str = "lat",
    lon: str = "lon",
    lat: str = "lat",
    out_id: str = "facility",
    out_dist: str = "dist_m",
    max_facilities: int | None = None,
) -> DataFrame:
    """``points`` + (``facility``, ``dist_m``): the id of the closest
    facility (haversine) and the distance to it."""
    check_layer_size(
        facilities, what="nearest_facility facility layer",
        max_rows=(MAX_FOLD_FACILITIES if max_facilities is None
                  else max_facilities),
        fallback_hint="Use knn_join(k=1) for facility sets beyond the "
                      "closure envelope.",
    )
    rows = (facilities.select(F.col(fac_id).cast("long").alias("id"),
                              F.col(fac_lon).cast("double").alias("flon"),
                              F.col(fac_lat).cast("double").alias("flat"))
            .collect())
    if not rows:
        raise ValueError("nearest_facility: empty facility layer")
    rows.sort(key=lambda r: r["id"])
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    flon = np.array([float(r["flon"]) for r in rows], dtype=np.float64)
    flat = np.array([float(r["flat"]) for r in rows], dtype=np.float64)

    from ..geo.geodesic import haversine

    @F.pandas_udf("id long, d double")
    def _assign(lon_s: pd.Series, lat_s: pd.Series) -> pd.DataFrame:
        px = lon_s.to_numpy(np.float64)[:, None]
        py = lat_s.to_numpy(np.float64)[:, None]
        n = px.shape[0]
        best_d = np.full(n, np.inf)
        best_i = np.zeros(n, dtype=np.int64)
        ar = np.arange(n)
        for s in range(0, len(ids), _FAC_CHUNK):
            d = haversine(px, py,
                          flon[None, s:s + _FAC_CHUNK],
                          flat[None, s:s + _FAC_CHUNK])
            j = d.argmin(axis=1)  # first minimum within the chunk
            dj = d[ar, j]
            upd = dj < best_d  # strict <: earlier (smaller) id wins ties
            best_d[upd] = dj[upd]
            best_i[upd] = s + j[upd]
        return pd.DataFrame({"id": ids[best_i], "d": best_d})

    return points.withColumn("_best", _assign(F.col(lon), F.col(lat))).select(
        *points.columns,
        F.col("_best.id").alias(out_id),
        F.col("_best.d").alias(out_dist),
    )

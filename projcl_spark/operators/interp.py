"""Inverse-distance-weighted (IDW) gridding — spatial interpolation from
scattered samples onto the cell grid (engine-added; the reference samples
rasters at given coordinates, kernel/pl_sample.opencl, but never builds a
raster FROM scattered points — gridding is the inverse problem).

Scale shape: each sample scatters to the (2·ring+1)² grid cells around it
(explode inside the task — amplification is bounded by the kernel
footprint and applies to the SPARSE sample side only), then ONE partial
aggregate per target cell folds Σw·v and Σw.  No joins; the single
exchange moves O(populated cells) pre-aggregated rows.  This is the
sparse-scatter discipline of ``raster.kde_smooth``, with data-dependent
weights instead of separable taps (IDW's kernel depends on the exact
sample-to-center distance, so it cannot be separated).

Longitude wraps (cylinder, consistent with ``index.cells``); latitude
contributions off the grid are dropped.  The sample-to-center longitude
delta is wrapped into ±180° with the same floor(x + 0.5) idiom as
``pip.winding_contains_np`` so seam-adjacent cells weight their
neighbors correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import cell_xy_col


def idw_grid(
    samples: DataFrame,
    res: int,
    ring: int = 2,
    power: int = 2,
    eps: float = 1e-12,
    lon: str = "lon",
    lat: str = "lat",
    val: str = "val",
) -> DataFrame:
    """Interpolate ``val`` onto every grid cell within ``ring`` cells of a
    sample: idw = Σ wᵢ·vᵢ / Σ wᵢ with wᵢ = 1 / (dᵢ^power + eps), d in
    cos-lat-corrected degrees to the target CELL CENTER.

    ``power`` must be even: d^power is then built from the squared
    distance by exact multiplications — no pow(), whose last ulp differs
    between libm implementations, keeping engine and SQL oracles
    bit-comparable.  The weights are strictly positive, so both Σ are
    well-conditioned (no cancellation) and the ratio is stable to ~1e-13
    relative under any summation order — callers quantize at 1e-6.

    Returns (cell_id, n_contrib, idw).
    """
    if power <= 0 or power % 2:
        raise ValueError("power must be a positive even integer")
    n = 1 << res
    offs = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)
    ])
    ix, iy = cell_xy_col(F.col(lon), F.col(lat), res)
    base = samples.select(
        F.col(lon).alias("_lon"), F.col(lat).alias("_lat"),
        F.col(val).cast("double").alias("_v"),
        ix.alias("_ix"), iy.alias("_iy"),
    )
    sc = (
        base.select("_lon", "_lat", "_v", "_ix", "_iy",
                    F.explode(offs).alias("t"))
        .select(
            F.pmod(F.col("_ix") + F.col("t.dx"), F.lit(n)).alias("tx"),
            (F.col("_iy") + F.col("t.dy")).alias("ty"),
            "_lon", "_lat", "_v",
        )
        .where((F.col("ty") >= 0) & (F.col("ty") < n))
    )
    lon_c = (F.col("tx") + 0.5) / n * 360.0 - 180.0
    lat_c = (F.col("ty") + 0.5) / n * 180.0 - 90.0
    dlon_raw = F.col("_lon") - lon_c
    dlon = dlon_raw - 360.0 * F.floor(dlon_raw / 360.0 + 0.5)
    dx = dlon * F.cos(F.radians(lat_c))
    dy = F.col("_lat") - lat_c
    d2 = dx * dx + dy * dy
    dk = d2
    for _ in range(power // 2 - 1):
        dk = dk * d2
    w = F.lit(1.0) / (dk + F.lit(eps))
    return (
        sc.select(
            (F.col("tx") * n + F.col("ty")).alias("cell_id"),
            (w * F.col("_v")).alias("_wv"), w.alias("_w"),
        )
        .groupBy("cell_id")
        .agg(F.sum("_wv").alias("_swv"), F.sum("_w").alias("_sw"),
             F.count("*").alias("n_contrib"))
        .select("cell_id", "n_contrib",
                (F.col("_swv") / F.col("_sw")).alias("idw"))
    )

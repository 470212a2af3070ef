"""Geodesic math: haversine inverse, spherical direct, and live Vincenty.

Spherical semantics follow ``/root/reference/kernel/pl_geodesic.opencl``:
- inverse (many-to-many distance): haversine, lines 31-59;
- forward fixed-distance / fixed-angle: spherical direct formula, lines
  61-122, with the distance pre-normalized by the major axis
  (``src/projcl_run.c:704``).

The ellipsoidal direct/inverse kernels are DISABLED in the reference (the
Vincenty kernel is commented out, ``pl_geodesic.opencl:139-209``, and the
host lookup of ``*_e`` kernels fails at runtime — ``src/projcl_geodesic.c:
169-176``; "elliptical geodesic calculations" is reference TODO:2).  This
engine implements them live, in float64, from the published Vincenty (1975)
direct/inverse solutions with a fixed iteration cap + convergence mask.
"""

from __future__ import annotations

import numpy as np

from ..core.spheroid import Spheroid, SpheroidInfo, get_spheroid_info

VINCENTY_MAX_ITER = 30
VINCENTY_TOL = 1e-12


def haversine(lon1, lat1, lon2, lat2, radius: float | None = None):
    """Great-circle distance in meters (spherical).

    Mirrors ``pl_inverse_geodesic_s``: d = 2R·asin √(sin²(Δφ/2) +
    cos φ₁ cos φ₂ sin²(Δλ/2)).  Default radius = authalic-sphere major axis.
    """
    if radius is None:
        radius = get_spheroid_info(Spheroid.SPHERE).major_axis
    lam1, phi1 = np.radians(lon1), np.radians(lat1)
    lam2, phi2 = np.radians(lon2), np.radians(lat2)
    shp = np.sin(0.5 * (phi2 - phi1))
    shl = np.sin(0.5 * (lam2 - lam1))
    return 2.0 * radius * np.arcsin(
        np.sqrt(np.clip(shp * shp + np.cos(phi1) * np.cos(phi2) * shl * shl, 0.0, 1.0))
    )


def spherical_direct(lon, lat, azimuth_deg, distance_m, radius: float | None = None):
    """Destination point along a great circle (spherical direct problem).

    Mirrors ``pl_forward_geodesic_fixed_distance_s`` / ``..._fixed_angle_s``.
    Returns (lon2, lat2) in degrees; azimuth clockwise from north.
    """
    if radius is None:
        radius = get_spheroid_info(Spheroid.SPHERE).major_axis
    lam1, phi1 = np.radians(lon), np.radians(lat)
    az = np.radians(azimuth_deg)
    d = np.asarray(distance_m, dtype=np.float64) / radius
    sin_d, cos_d = np.sin(d), np.cos(d)
    sin_phi, cos_phi = np.sin(phi1), np.cos(phi1)
    sin_az, cos_az = np.sin(az), np.cos(az)
    phi2 = np.arcsin(np.clip(sin_phi * cos_d + cos_phi * sin_d * cos_az, -1.0, 1.0))
    lam2 = lam1 + np.arctan2(sin_d * sin_az, cos_phi * cos_d - sin_phi * sin_d * cos_az)
    lam2 = np.where(np.abs(lam2) > np.pi, lam2 - np.copysign(2 * np.pi, lam2), lam2)
    return np.degrees(lam2), np.degrees(phi2)


def rhumb_inverse(lon1, lat1, lon2, lat2, radius: float | None = None):
    """Loxodrome distance (m) and constant course (deg, [0, 360)).

    Engine-added navigation op (the reference's geodesic kernels,
    ``kernel/pl_geodesic.opencl``, are great-circle only); Mercator
    isometric-latitude formulation — the numpy twin of
    ``oracle.rhumb_stages``, which Spark codegen and the DuckDB oracle
    share.  A rhumb line is never shorter than the great circle; tests
    pin that invariant against :func:`haversine`.
    """
    if radius is None:
        radius = get_spheroid_info(Spheroid.SPHERE).major_axis
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    dphi = phi2 - phi1
    dlon = np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64)
    dlam = np.radians(dlon - 360.0 * np.floor((dlon + 180.0) / 360.0))
    dpsi = np.log(np.tan(np.pi / 4 + phi2 / 2)) - np.log(np.tan(np.pi / 4 + phi1 / 2))
    q = np.where(np.abs(dpsi) > 1e-12, dphi / np.where(dpsi == 0, 1.0, dpsi),
                 np.cos(phi1))
    dist = np.sqrt(dphi * dphi + q * q * dlam * dlam) * radius
    course = (np.degrees(np.arctan2(dlam, dpsi)) + 360.0) % 360.0
    return dist, course


def _spheroid(spheroid: Spheroid | SpheroidInfo) -> SpheroidInfo:
    return spheroid if isinstance(spheroid, SpheroidInfo) else get_spheroid_info(spheroid)


def vincenty_inverse(lon1, lat1, lon2, lat2, spheroid: Spheroid = Spheroid.WGS_84):
    """Ellipsoidal geodesic distance (m), Vincenty 1975 inverse.

    Vectorized with a convergence mask; near-antipodal pairs that fail to
    converge fall back to the haversine estimate on the mean radius (flagged
    by the second return value).  Returns (distance_m, converged_mask).
    """
    info = _spheroid(spheroid)
    a, b, f = info.major_axis, info.minor_axis, info.flattening
    if f == 0.0:
        d = haversine(lon1, lat1, lon2, lat2, radius=a)
        return d, np.ones_like(d, dtype=bool)

    lam1, phi1 = np.radians(np.asarray(lon1, np.float64)), np.radians(np.asarray(lat1, np.float64))
    lam2, phi2 = np.radians(np.asarray(lon2, np.float64)), np.radians(np.asarray(lat2, np.float64))
    L = lam2 - lam1
    U1 = np.arctan((1.0 - f) * np.tan(phi1))
    U2 = np.arctan((1.0 - f) * np.tan(phi2))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = np.array(L, copy=True)
    converged = np.zeros(np.broadcast(lam1, lam2).shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sigma_m = np.zeros_like(lam)

    for _ in range(VINCENTY_MAX_ITER):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.hypot(cosU2 * sin_lam, cosU1 * sinU2 - sinU1 * cosU2 * cos_lam)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma == 0.0, 0.0, cosU1 * cosU2 * sin_lam / np.where(sin_sigma == 0, 1, sin_sigma))
            cos2_alpha = 1.0 - sin_alpha * sin_alpha
            cos_2sigma_m = np.where(
                cos2_alpha == 0.0, 0.0, cos_sigma - 2.0 * sinU1 * sinU2 / np.where(cos2_alpha == 0, 1, cos2_alpha)
            )
        Cc = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
        lam_new = L + (1.0 - Cc) * f * sin_alpha * (
            sigma + Cc * sin_sigma * (cos_2sigma_m + Cc * cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2))
        )
        delta = np.abs(lam_new - lam)
        lam = np.where(converged, lam, lam_new)
        converged = converged | (delta < VINCENTY_TOL)
        if np.all(converged):
            break

    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsigma = B * sin_sigma * (
        cos_2sigma_m
        + B / 4.0 * (
            cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2)
            - B / 6.0 * cos_2sigma_m * (-3.0 + 4.0 * sin_sigma**2) * (-3.0 + 4.0 * cos_2sigma_m**2)
        )
    )
    s = b * A * (sigma - dsigma)
    fallback = haversine(lon1, lat1, lon2, lat2, radius=(2 * a + b) / 3.0)
    return np.where(converged, s, fallback), converged


def vincenty_direct(lon, lat, azimuth_deg, distance_m, spheroid: Spheroid = Spheroid.WGS_84):
    """Ellipsoidal direct problem (Vincenty 1975 / Rainsford-Helmert).

    Same semantics the reference's disabled kernel intended
    (``pl_geodesic.opencl:124-208``); fixed-count vectorized iteration.
    Returns (lon2_deg, lat2_deg).
    """
    info = _spheroid(spheroid)
    a, b, f = info.major_axis, info.minor_axis, info.flattening
    if f == 0.0:
        return spherical_direct(lon, lat, azimuth_deg, distance_m, radius=a)

    lam1, phi1 = np.radians(np.asarray(lon, np.float64)), np.radians(np.asarray(lat, np.float64))
    alpha1 = np.radians(np.asarray(azimuth_deg, np.float64))
    s = np.asarray(distance_m, np.float64)

    sin_a1, cos_a1 = np.sin(alpha1), np.cos(alpha1)
    tanU1 = (1.0 - f) * np.tan(phi1)
    cosU1 = 1.0 / np.sqrt(1.0 + tanU1 * tanU1)
    sinU1 = tanU1 * cosU1
    sigma1 = np.arctan2(tanU1, cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma = s / (b * A)
    for _ in range(VINCENTY_MAX_ITER):
        cos_2sigma_m = np.cos(2.0 * sigma1 + sigma)
        sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)
        dsigma = B * sin_sigma * (
            cos_2sigma_m
            + B / 4.0 * (
                cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2)
                - B / 6.0 * cos_2sigma_m * (-3.0 + 4.0 * sin_sigma**2) * (-3.0 + 4.0 * cos_2sigma_m**2)
            )
        )
        sigma_new = s / (b * A) + dsigma
        if np.all(np.abs(sigma_new - sigma) < VINCENTY_TOL):
            sigma = sigma_new
            break
        sigma = sigma_new

    sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)
    cos_2sigma_m = np.cos(2.0 * sigma1 + sigma)
    tmp = sinU1 * sin_sigma - cosU1 * cos_sigma * cos_a1
    phi2 = np.arctan2(
        sinU1 * cos_sigma + cosU1 * sin_sigma * cos_a1,
        (1.0 - f) * np.hypot(sin_alpha, tmp),
    )
    lam = np.arctan2(sin_sigma * sin_a1, cosU1 * cos_sigma - sinU1 * sin_sigma * cos_a1)
    Cc = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - Cc) * f * sin_alpha * (
        sigma + Cc * sin_sigma * (cos_2sigma_m + Cc * cos_sigma * (-1.0 + 2.0 * cos_2sigma_m**2))
    )
    lam2 = lam1 + L
    lam2 = np.where(np.abs(lam2) > np.pi, lam2 - np.copysign(2 * np.pi, lam2), lam2)
    return np.degrees(lam2), np.degrees(phi2)


def densify_spherical(df, n: int, lon1="lon1", lat1="lat1",
                      lon2="lon2", lat2="lat2"):
    """Explode each (p1, p2) row into ``n`` intermediate great-circle
    points (fractions k/(n+1), k = 1..n, endpoints excluded) — the
    geodesic-path companion to the reference's point geodesics
    (kernel/pl_geodesic.opencl): where the reference evaluates distance
    and destination, an analytics engine materializes the path itself
    (flight corridors, route tiling, densified track rendering).

    Pure codegen: the slerp is generated from the SAME SQL text as the
    DuckDB oracle (``oracle.slerp_lonlat``); the explode is a
    ``posexplode(sequence(...))`` — no Python, no shuffle (narrow map +
    generate), output columns appended as (seg_k, ilon, ilat).
    Degenerate pairs (coincident or exactly antipodal, where the slerp
    denominator sin(d) = 0) yield NaN — callers filter; the md5-derived
    test envelope makes them measure-zero.
    """
    from pyspark.sql import functions as F

    from .. import oracle as _o

    frac = f"(CAST(_k AS DOUBLE) / {float(n + 1)!r})"
    lon_e, lat_e = _o.slerp_lonlat(lon1, lat1, lon2, lat2, frac)
    return (
        df.select("*", F.explode(F.sequence(F.lit(1), F.lit(n))).alias("_k"))
        .select("*", F.expr(lon_e).alias("ilon"), F.expr(lat_e).alias("ilat"))
        .withColumnRenamed("_k", "seg_k")
    )

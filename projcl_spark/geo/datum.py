"""Datum shifts: 27-datum Helmert table + fused 3-stage transform.

Mirrors the reference pipeline exactly, as one fused float64 numpy function
(the reference runs three device passes over x/y/z channel buffers;
fusion is free under numpy):

1. geodetic → ECEF cartesian (``kernel/pl_datum.opencl:22-55``);
2. one precomposed 4×4 affine: M = inv(M_dst) · M_src, built on the driver
   (LAPACK invert + BLAS multiply in the reference, ``src/projcl_run.c:
   823-909``; ``np.linalg`` here) so each point needs one matmul, not two;
3. ECEF → geodetic via the Toms 1996 non-iterative approximation
   (``kernel/pl_datum.opencl:57-108``, region constant AD_C = 1.0026).

Datum table source: "WGS 84 Implementation Manual" (as the reference,
``src/projcl_run.c:123-181``) — Dx,Dy,Dz meters; Ex,Ey,Ez arc-seconds; ppm.
"""

from __future__ import annotations

import math
from enum import IntEnum

import numpy as np

from ..core.spheroid import Spheroid, get_spheroid_info

AD_C = 1.0026  # Toms region 1 constant
SEC_TO_RAD = math.pi / (180.0 * 3600.0)


class Datum(IntEnum):
    WGS_84 = 0
    WGS_72 = 1
    ED_50 = 2
    ED_79 = 3
    ED_87 = 4
    AUSTRIA_NS = 5
    BELGIUM_50 = 6
    BERNE_1873 = 7
    CH_1903 = 8
    DANISH_GI_1934 = 9
    NOUV_TRIG_DE_FRANCE_GREENWICH = 10
    NOUV_TRIG_DE_FRANCE_PARIS = 11
    POTSDAM = 12
    GGRS_87 = 13
    HJORSEY_55 = 14
    IRELAND_65 = 15
    ITALY_1940 = 16
    NOUV_TRIG_DE_LUX = 17
    NETHERLANDS_1921 = 18
    OSGB_36 = 19
    PORTUGAL_DLX = 20
    PORTUGAL_1973 = 21
    RNB_72 = 22
    RT_90 = 23
    NAD_27 = 24
    NAD_83 = 25
    ETRS_89 = 26


#                  Dx       Dy       Dz       Ex      Ey      Ez        ppm
_PARAMS: dict[Datum, tuple[float, float, float, float, float, float, float]] = {
    Datum.WGS_84: (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Datum.WGS_72: (0.0, 0.0, 4.5, 0.0, 0.0, -0.554, 0.22),
    Datum.ED_50: (-87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0),
    Datum.ED_79: (-86.0, -98.0, -119.0, 0.0, 0.0, 0.0, 0.0),
    Datum.ED_87: (-82.5, -91.7, -117.7, 0.1338, -0.0625, -0.047, 0.045),
    Datum.AUSTRIA_NS: (595.6, 87.3, 473.3, 4.7994, 0.0671, 5.7850, 2.555),
    Datum.BELGIUM_50: (-55.0, 49.0, -158.0, 0.0, 0.0, 0.0, 0.0),
    Datum.BERNE_1873: (649.0, 9.0, 376.0, 0.0, 0.0, 0.0, 0.0),
    Datum.CH_1903: (660.1, 13.1, 369.2, 0.8048, 0.5777, 0.9522, 5.66),
    Datum.DANISH_GI_1934: (662.0, 18.0, 734.0, 0.0, 0.0, 0.0, 0.0),
    Datum.NOUV_TRIG_DE_FRANCE_GREENWICH: (-168.0, -60.0, 320.0, 0.0, 0.0, 0.0, 0.0),
    Datum.NOUV_TRIG_DE_FRANCE_PARIS: (-168.0, -60.0, 320.0, 0.0, 0.0, 8414.03, 0.0),
    Datum.POTSDAM: (587.0, 16.0, 393.0, 0.0, 0.0, 0.0, 0.0),
    Datum.GGRS_87: (199.6, -75.1, -246.3, 0.0202, 0.0034, 0.0135, -0.015),
    Datum.HJORSEY_55: (-73.0, 46.0, -86.0, 0.0, 0.0, 0.0, 0.0),
    Datum.IRELAND_65: (506.0, -122.0, 611.0, 0.0, 0.0, 0.0, 0.0),
    Datum.ITALY_1940: (-133.0, -50.0, 97.0, 0.0, 0.0, 44828.40, 0.0),
    Datum.NOUV_TRIG_DE_LUX: (-262.0, 75.0, 25.0, 0.0, 0.0, 0.0, 0.0),
    Datum.NETHERLANDS_1921: (719.0, 47.0, 640.0, 0.0, 0.0, 0.0, 0.0),
    Datum.OSGB_36: (375.0, -111.0, 431.0, 0.0, 0.0, 0.0, 0.0),
    Datum.PORTUGAL_DLX: (504.1, -220.9, 563.0, 0.0, 0.0, -0.554, 0.22),
    Datum.PORTUGAL_1973: (227.0, 97.5, 35.4, 0.0, 0.0, -0.554, 0.22),
    Datum.RNB_72: (-104.0, 80.0, -75.0, 0.0, 0.0, 0.0, 0.0),
    Datum.RT_90: (424.3, -80.5, 613.1, 4.3965, -1.9866, 5.1846, 0.0),
    Datum.NAD_27: (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0),
    Datum.NAD_83: (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
    Datum.ETRS_89: (0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
}

# Conventional source spheroid per datum (NAD 27 ↔ Clarke 1866 etc.) — the
# reference leaves spheroid choice to the caller; these are sane defaults.
DATUM_SPHEROID: dict[Datum, Spheroid] = {
    Datum.NAD_27: Spheroid.CLARKE_1866,
    Datum.OSGB_36: Spheroid.AIRY_1830,
    Datum.POTSDAM: Spheroid.BESSEL_1841,
    Datum.CH_1903: Spheroid.BESSEL_1841,
}


def _helmert_matrix(d: Datum) -> np.ndarray:
    """Row-major 4×4 affine for datum→WGS84 (7-parameter, small-angle)."""
    dx, dy, dz, ex, ey, ez, ppm = _PARAMS[d]
    m = 1.0 + ppm * 1e-6
    rx, ry, rz = ex * SEC_TO_RAD, ey * SEC_TO_RAD, ez * SEC_TO_RAD
    return np.array(
        [
            [m, -m * rz, m * ry, dx],
            [m * rz, m, -m * rx, dy],
            [-m * ry, m * rx, m, dz],
            [0.0, 0.0, 0.0, 1.0],
        ],
        dtype=np.float64,
    )


def combined_matrix(src: Datum, dst: Datum) -> np.ndarray:
    """Precomposed M = inv(M_dst) @ M_src (one matmul per point)."""
    return np.linalg.inv(_helmert_matrix(dst)) @ _helmert_matrix(src)


def geodetic_to_ecef(lon, lat, spheroid: Spheroid):
    """(λ, φ) degrees → ECEF meters on the spheroid surface (h = 0)."""
    info = get_spheroid_info(spheroid)
    lam, phi = np.radians(lon), np.radians(lat)
    sin_phi, cos_phi = np.sin(phi), np.cos(phi)
    r = info.major_axis / np.sqrt(1.0 - info.ecc2 * sin_phi * sin_phi)
    return r * cos_phi * np.cos(lam), r * cos_phi * np.sin(lam), r * info.one_ecc2 * sin_phi


def ecef_to_geodetic(x, y, z, spheroid: Spheroid):
    """ECEF → (λ, φ) degrees, Toms 1996 non-iterative (one Bowring step)."""
    info = get_spheroid_info(spheroid)
    a, b = info.major_axis, info.minor_axis
    es, one_es = info.ecc2, info.one_ecc2
    lam = np.where(
        x != 0.0,
        np.arctan2(y, x),
        np.where(np.asarray(y) <= 0.0, -np.pi / 2, np.pi / 2),
    )
    w = np.hypot(x, y)
    t0 = z * AD_C
    s0 = np.hypot(t0, w)
    sin_b0 = t0 / s0
    cos_b0 = w / s0
    t1 = z + b * es / one_es * sin_b0**3
    total = w - a * es * cos_b0**3
    phi = np.arctan2(t1, total)
    return np.degrees(lam), np.degrees(phi)


def shift_datum(
    lon,
    lat,
    src_datum: Datum,
    dst_datum: Datum,
    src_spheroid: Spheroid | None = None,
    dst_spheroid: Spheroid | None = None,
):
    """Fused datum shift (ECEF → Helmert → geodetic), like ``pl_shift_datum``.

    Reference driver: ``src/projcl_datum.c:114-132``.  Spheroids default to
    the datum's conventional ellipsoid (WGS 84 otherwise).
    """
    # `is not None` — Spheroid.SPHERE == 0 is falsy, `or` would discard it
    src_sph = src_spheroid if src_spheroid is not None else DATUM_SPHEROID.get(src_datum, Spheroid.WGS_84)
    dst_sph = dst_spheroid if dst_spheroid is not None else DATUM_SPHEROID.get(dst_datum, Spheroid.WGS_84)
    x, y, z = geodetic_to_ecef(lon, lat, src_sph)
    M = combined_matrix(src_datum, dst_datum)
    x2 = M[0, 0] * x + M[0, 1] * y + M[0, 2] * z + M[0, 3]
    y2 = M[1, 0] * x + M[1, 1] * y + M[1, 2] * z + M[1, 3]
    z2 = M[2, 0] * x + M[2, 1] * y + M[2, 2] * z + M[2, 3]
    return ecef_to_geodetic(x2, y2, z2, dst_sph)

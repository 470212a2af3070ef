"""Spheroid (reference ellipsoid) registry and derived constants.

Re-expresses the reference's spheroid table and host-side derived-constant
computation (``/root/reference/src/projcl_spheroid.c:19-108``) in pure
float64 numpy/Python.  All derived series (meridional-distance ``en``,
authalic-latitude ``apa``, Krüger transverse-Mercator ``alpha``/``beta``)
are computed once, on the driver, in double precision — exactly the split
the reference uses (host doubles → device constants).

The Krüger series is order-4 in the third flattening n (the reference
zero-initialises the order-5 tail, ``projcl_spheroid.c:74-100``), per
Karney, "Transverse Mercator with an accuracy of a few nanometers",
J. Geodesy 85(8), 2011 (public, arXiv:1002.1417).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import IntEnum


class Spheroid(IntEnum):
    """Mirrors the reference enum order (``projcl_types.h:13-57``)."""

    SPHERE = 0
    WGS_84 = 1
    GRS_80 = 2
    AIRY_1830 = 3
    AIRY_1848 = 4
    MODIFIED_AIRY = 5
    BESSEL_1841 = 6
    CLARKE_1866 = 7
    CLARKE_1880_RGS = 8
    GRS_1967 = 9
    WGS_84_MAJOR_AUXILIARY_SPHERE = 10
    INTERNATIONAL_1924 = 11


# (major_axis, minor_axis) in meters — reference table projcl_spheroid.c:19-32
_AXES: dict[Spheroid, tuple[float, float]] = {
    Spheroid.SPHERE: (6370997.0, 6370997.0),
    Spheroid.WGS_84: (6378137.0, 6356752.31424),
    Spheroid.GRS_80: (6378137.0, 6356752.31414),
    Spheroid.AIRY_1830: (6377563.396, 6356256.910),
    Spheroid.AIRY_1848: (6377563.0, 6356256.161),
    Spheroid.MODIFIED_AIRY: (6377340.189, 6356034.448),
    Spheroid.BESSEL_1841: (6377397.155, 6356078.963),
    Spheroid.CLARKE_1866: (6378206.4, 6356583.8),
    Spheroid.CLARKE_1880_RGS: (6378249.145, 6356514.870),
    Spheroid.GRS_1967: (6378160.0, 6356774.7192),
    Spheroid.WGS_84_MAJOR_AUXILIARY_SPHERE: (6378137.0, 6378137.0),
    Spheroid.INTERNATIONAL_1924: (6378388.0, 6356911.9),
}

# Meridional-distance (rectifying) series coefficients, Snyder/proj lineage
# (constants C00..C88 of projcl_spheroid.c:6-17).
_C00, _C02, _C04, _C06, _C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
_C22 = 0.75
_C44, _C46, _C48 = 0.46875, 0.01302083333333333333, 0.00712076822916666666
_C66, _C68 = 0.36458333333333333333, 0.00569661458333333333
_C88 = 0.3076171875


def is_spherical(s: Spheroid) -> bool:
    """``_pl_spheroid_is_spherical`` (projcl_spheroid.c:35-37)."""
    return s in (Spheroid.SPHERE, Spheroid.WGS_84_MAJOR_AUXILIARY_SPHERE)


@dataclass(frozen=True)
class SpheroidInfo:
    tag: Spheroid
    major_axis: float
    minor_axis: float
    inverse_flattening: float
    ecc: float
    ecc2: float
    one_ecc2: float
    ec: float
    en: tuple[float, ...] = field(default=())
    apa: tuple[float, ...] = field(default=())
    krueger_A: float = 0.0
    krueger_alpha: tuple[float, ...] = field(default=())
    krueger_beta: tuple[float, ...] = field(default=())

    @property
    def is_spherical(self) -> bool:
        return is_spherical(self.tag)

    @property
    def flattening(self) -> float:
        return 0.0 if math.isinf(self.inverse_flattening) else 1.0 / self.inverse_flattening


def get_spheroid_info(tag: Spheroid) -> SpheroidInfo:
    """Derived constants, float64 (mirrors ``_pl_get_spheroid_info``)."""
    a, b = _AXES[Spheroid(tag)]
    inv_f = 1.0 / (1.0 - b / a) if a > b else math.inf
    one_es = (b * b) / (a * a)
    es = 1.0 - one_es
    e = math.sqrt(es)
    # ec: total-q constant for Albers polar cutoff (projcl_spheroid.c:52)
    ec = 1.0 - 0.5 * one_es * (math.log1p(-e) - math.log1p(e)) / e if e > 0 else 1.0

    en = (
        _C00 - es * (_C02 + es * (_C04 + es * (_C06 + es * _C08))),
        es * (_C22 - es * (_C04 + es * (_C06 + es * _C08))),
        (es * es) * (_C44 - es * (_C46 + es * _C48)),
        (es * es * es) * (_C66 - es * _C68),
        (es * es * es * es) * _C88,
    )

    # Authalic-latitude series ("Map Projections Used by the USGS" p.176)
    apa = (
        es / 3.0 + es * (31.0 * es / 180.0 + es * (517.0 * es / 5040.0)),
        es * (23.0 * es / 360.0 + es * (251.0 * es / 3780.0)),
        es * es * es * 761.0 / 45360.0,
    )

    n = (a - b) / (a + b)
    n2 = n * n
    krueger_A = (1.0 + (0.25 + 1.0 / 64.0 * n2) * n2) / (1.0 + n)
    # Order-4 Karney series (order-5 tail deliberately zero, as the reference)
    alpha = (
        (0.5 + (-2.0 / 3.0 + (0.3125 + (41.0 / 180.0) * n) * n) * n) * n,
        (13.0 / 48.0 + (-0.6 + (557.0 / 1440.0) * n) * n) * n * n,
        (61.0 / 240.0 - (103.0 / 140.0) * n) * n * n * n,
        (49561.0 / 161280.0) * n2 * n2,
    )
    beta = (
        (0.5 + (-2.0 / 3.0 + (37.0 / 96.0 + (-1.0 / 360.0) * n) * n) * n) * n,
        (1.0 / 48.0 + (1.0 / 15.0 + (-437.0 / 1440.0) * n) * n) * n * n,
        (17.0 / 480.0 + (-37.0 / 840.0) * n) * n * n * n,
        (4397.0 / 161280.0) * n2 * n2,
    )

    return SpheroidInfo(
        tag=Spheroid(tag),
        major_axis=a,
        minor_axis=b,
        inverse_flattening=inv_f,
        ecc=e,
        ecc2=es,
        one_ecc2=one_es,
        ec=ec,
        en=en,
        apa=apa,
        krueger_A=krueger_A,
        krueger_alpha=alpha,
        krueger_beta=beta,
    )

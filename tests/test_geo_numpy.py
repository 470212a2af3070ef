"""Geodesic + datum-shift tests for the numpy core.

The reference leaves these paths untested (``/root/reference/README.md:34-38``)
and its ellipsoidal Vincenty kernel is disabled
(``kernel/pl_geodesic.opencl:139-209`` commented out); we test them live:
- haversine vs hand values + symmetry (kernel/pl_geodesic.opencl:31-59 semantics);
- spherical direct vs round-trip through haversine (pl_geodesic.opencl:61-122);
- Vincenty inverse vs the classic Geoscience Australia test line;
- Vincenty direct∘inverse closure;
- datum shift WGS84→NAD27→WGS84 closure and known-magnitude sanity
  (datum table ``src/projcl_run.c:124-181``; pipeline ``pl_datum.opencl``).
"""

from __future__ import annotations

import numpy as np
import pytest

from projcl_spark.core.spheroid import Spheroid, get_spheroid_info
from projcl_spark.geo import datum as dt
from projcl_spark.geo.geodesic import (
    haversine,
    spherical_direct,
    vincenty_direct,
    vincenty_inverse,
)

R_SPHERE = get_spheroid_info(Spheroid.SPHERE).major_axis


def test_haversine_quarter_meridian():
    d = haversine(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([90.0]))
    assert abs(d[0] - np.pi / 2 * R_SPHERE) < 1e-6


def test_haversine_symmetry_and_zero():
    rng = np.random.default_rng(7)
    lon1, lat1 = rng.uniform(-180, 180, 100), rng.uniform(-85, 85, 100)
    lon2, lat2 = rng.uniform(-180, 180, 100), rng.uniform(-85, 85, 100)
    d12 = haversine(lon1, lat1, lon2, lat2)
    d21 = haversine(lon2, lat2, lon1, lat1)
    np.testing.assert_allclose(d12, d21, rtol=1e-12)
    assert np.abs(haversine(lon1, lat1, lon1, lat1)).max() < 1e-6


def test_spherical_direct_roundtrip():
    """Destination at distance d must be distance d away (haversine oracle)."""
    rng = np.random.default_rng(11)
    lon, lat = rng.uniform(-120, 120, 500), rng.uniform(-60, 60, 500)
    az = rng.uniform(0, 360, 500)
    dist = rng.uniform(1e3, 5e6, 500)
    dlon, dlat = spherical_direct(lon, lat, az, dist)
    back = haversine(lon, lat, dlon, dlat)
    np.testing.assert_allclose(back, dist, rtol=1e-9)


def test_vincenty_flinders_buninyong():
    """Classic GA test line (Flinders Peak → Buninyong, GDA94/WGS84-class
    ellipsoid): s = 54 972.271 m. Public reference value (Geoscience
    Australia's Vincenty test data)."""
    lat1 = -(37 + 57 / 60 + 3.72030 / 3600)
    lon1 = 144 + 25 / 60 + 29.52440 / 3600
    lat2 = -(37 + 39 / 60 + 10.15610 / 3600)
    lon2 = 143 + 55 / 60 + 35.38390 / 3600
    d, az = vincenty_inverse(
        np.array([lon1]), np.array([lat1]), np.array([lon2]), np.array([lat2]),
        Spheroid.GRS_80,
    )
    assert abs(d[0] - 54972.271) < 0.01


def test_vincenty_direct_inverse_closure():
    rng = np.random.default_rng(13)
    lon, lat = rng.uniform(-120, 120, 300), rng.uniform(-60, 60, 300)
    az = rng.uniform(0, 360, 300)
    dist = rng.uniform(1e3, 2e6, 300)
    dlon, dlat = vincenty_direct(lon, lat, az, dist)
    d2, _ = vincenty_inverse(lon, lat, dlon, dlat)
    np.testing.assert_allclose(d2, dist, rtol=1e-8)


def test_vincenty_coincident_points():
    d, _ = vincenty_inverse(np.array([10.0]), np.array([20.0]),
                            np.array([10.0]), np.array([20.0]))
    assert abs(d[0]) < 1e-9


def test_datum_identity():
    lon = np.array([5.0, -120.0, 144.9])
    lat = np.array([52.0, 38.0, -37.8])
    lo, la = dt.shift_datum(lon, lat, dt.Datum.WGS_84, dt.Datum.WGS_84)
    np.testing.assert_allclose(lo, lon, atol=1e-9)
    np.testing.assert_allclose(la, lat, atol=1e-9)


def test_datum_roundtrip_nad27():
    """WGS84 → NAD27 → WGS84 closes (matrix precompose is exactly invertible)."""
    rng = np.random.default_rng(17)
    lon = rng.uniform(-125, -70, 200)  # NAD27 validity: North America
    lat = rng.uniform(25, 50, 200)
    lo1, la1 = dt.shift_datum(lon, lat, dt.Datum.WGS_84, dt.Datum.NAD_27)
    lo2, la2 = dt.shift_datum(lo1, la1, dt.Datum.NAD_27, dt.Datum.WGS_84)
    assert np.abs(lo2 - lon).max() < 1e-7
    assert np.abs(la2 - lat).max() < 1e-7


def test_datum_shift_magnitude():
    """WGS84→NAD27 shift in CONUS is tens of meters, never km."""
    lon = np.array([-100.0])
    lat = np.array([40.0])
    lo, la = dt.shift_datum(lon, lat, dt.Datum.WGS_84, dt.Datum.NAD_27)
    dist = haversine(lon, lat, lo, la)
    assert 1.0 < dist[0] < 300.0


def test_ecef_roundtrip():
    rng = np.random.default_rng(19)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89, 89, 500)
    x, y, z = dt.geodetic_to_ecef(lon, lat, Spheroid.WGS_84)
    lo, la = dt.ecef_to_geodetic(x, y, z, Spheroid.WGS_84)
    assert np.abs(lo - lon).max() < 1e-7
    assert np.abs(la - lat).max() < 1e-6  # Toms 1996 is an approximation

"""Round-trip closure tests for the pure-numpy projection core.

Mirrors the reference harness ``/root/reference/test/projcl_test.c``:
- fixture: 200k points = grid over lon∈[-60,60], lat∈[-40,80] + circle of
  radius 40° (``projcl_test.c:31-35,460-467``), scaled down to 20k for CI;
- oracle: forward→inverse closure within DEGREES_TOL = 1/3600°
  (``projcl_test.c:28,648-669``); our float64 core is asserted much tighter
  (1e-6°) except for table/iteration-limited inverses;
- config matrix: spherical/ellipsoidal × centered/off-center × north/south
  parallels × the symmetric-parallel LCC edge case
  (``projcl_test.c:54-336``).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from projcl_spark.core.params import ProjectionParams, lcc_is_pathological
from projcl_spark.core.spheroid import Spheroid
from projcl_spark.proj import PROJECTIONS, SPHERICAL_ONLY, get_transform, resolve

ARCSEC = 1.0 / 3600.0  # reference DEGREES_TOL (projcl_test.c:28)
N = 20_000


def fixture_points(n: int = N) -> tuple[np.ndarray, np.ndarray]:
    """Grid + circle recipe from projcl_test.c:460-467."""
    half = n // 2
    i = np.arange(half, dtype=np.float64)
    rows = half / 500
    lon_g = -60.0 + 120.0 * (i % 500) / 499.0
    lat_g = -40.0 + 120.0 * np.floor(i / 500) / (rows - 1)
    t = 2 * math.pi * i / (half - 1)
    lon_c = -40.0 * np.cos(t)
    lat_c = -40.0 * np.sin(t)
    return np.concatenate([lon_g, lon_c]), np.concatenate([lat_g, lat_c])


# (name, params) matrix following projcl_test.c:54-336
CASES: list[tuple[str, ProjectionParams]] = []


def _add(proj: str, **kw):
    for sph in (Spheroid.SPHERE, Spheroid.WGS_84):
        if proj in SPHERICAL_ONLY and sph != Spheroid.SPHERE:
            continue
        if proj == "oblique_stereographic" and sph == Spheroid.SPHERE:
            continue  # reference implements _e only (projcl_run.c:520-566)
        CASES.append((proj, ProjectionParams(spheroid=sph, **kw)))


_add("mercator")
_add("mercator", scale=2.0, x0=1000.0, y0=-2000.0)
_add("albers_equal_area", rlat1=30.0, rlat2=60.0)
_add("albers_equal_area", rlat1=-50.0, rlat2=-10.0, lon0=20.0, lat0=10.0)
_add("lambert_conformal_conic", rlat1=30.0, rlat2=60.0)
_add("lambert_conformal_conic", rlat1=-50.0, rlat2=-20.0, lon0=-20.0, lat0=-15.0,
     x0=500.0, y0=700.0)
_add("lambert_conformal_conic", rlat1=30.0, rlat2=-30.0, lat0=10.0)  # pathological
_add("lambert_azimuthal_equal_area", lat0=45.0, lon0=10.0)
_add("lambert_azimuthal_equal_area", lat0=-30.0)
_add("american_polyconic", lat0=20.0, lon0=-10.0)
_add("american_polyconic", lat0=-20.0)
_add("oblique_stereographic", lat0=52.15616055555555, lon0=5.38763888888889,
     scale=0.9999079, x0=155000.0, y0=463000.0)  # RD New (classic Snyder case)
_add("oblique_stereographic", lat0=-25.0, lon0=15.0)
_add("transverse_mercator", lon0=9.0, scale=0.9996)
_add("transverse_mercator", lon0=-45.0, lat0=10.0, x0=500000.0)
_add("robinson")
_add("winkel_tripel")
_add("winkel_tripel", rlat1=40.0)

# looser closure for iteration/table-limited inverses (still ≤ reference 1″)
LOOSE = {"robinson": ARCSEC, "winkel_tripel": ARCSEC, "american_polyconic": ARCSEC}


@pytest.mark.parametrize(
    "proj,params", CASES, ids=[f"{p}-{pp.spheroid.name}-{i}" for i, (p, pp) in enumerate(CASES)]
)
def test_roundtrip(proj: str, params: ProjectionParams):
    lon, lat = fixture_points()
    # conic/TM validity: keep |lon - lon0| modest for TM; reference grid does too
    if proj == "transverse_mercator":
        keep = np.abs(lon - params.lon0) < 30.0
        lon, lat = lon[keep], lat[keep]
    fwd = get_transform(proj, params, "forward")
    inv = get_transform(proj, params, "inverse")
    x, y = fwd(lon, lat)
    assert np.isfinite(x).all() and np.isfinite(y).all()
    lon2, lat2 = inv(x, y)
    tol = LOOSE.get(proj, 1e-6)
    err_lon = np.abs(lon2 - lon)
    err_lat = np.abs(lat2 - lat)
    assert err_lon.max() < tol, f"lon err {err_lon.max():.3e} at {lon[err_lon.argmax()]}"
    assert err_lat.max() < tol, f"lat err {err_lat.max():.3e} at {lat[err_lat.argmax()]}"


def test_pathological_lcc_resolves_to_mercator():
    p = ProjectionParams(rlat1=30.0, rlat2=-30.0, lat0=10.0)
    assert lcc_is_pathological(p)
    name, _ = resolve("lambert_conformal_conic", p)
    assert name == "mercator"


def test_all_projections_registered():
    assert set(PROJECTIONS) == {
        "mercator", "albers_equal_area", "lambert_conformal_conic",
        "lambert_azimuthal_equal_area", "american_polyconic",
        "oblique_stereographic", "robinson", "transverse_mercator",
        "winkel_tripel",
    }


def test_mercator_known_value():
    """Spherical Mercator of (0, 45°N): y = R·asinh(tan 45°) = R·ln(1+√2)."""
    fwd = get_transform("mercator", ProjectionParams(), "forward")
    x, y = fwd(np.array([0.0]), np.array([45.0]))
    R = 6370997.0
    assert abs(x[0]) < 1e-9
    assert abs(y[0] - R * math.log(1 + math.sqrt(2))) < 1e-6


def test_nan_propagates():
    fwd = get_transform("mercator", ProjectionParams(), "forward")
    x, y = fwd(np.array([np.nan, 0.0]), np.array([0.0, np.nan]))
    assert np.isnan(x[0]) and np.isnan(y[1])


def test_differential_vs_pyproj_if_available():
    """Differential oracle vs pyproj (mirrors -DHAVE_PROJ4, projcl_test.c:497-605)."""
    try:
        import pyproj  # noqa: F401
    except ImportError:
        pytest.skip("pyproj not installed")
    from pyproj import Transformer

    lon, lat = fixture_points(2000)
    params = ProjectionParams(spheroid=Spheroid.WGS_84, rlat1=30.0, rlat2=60.0)
    fwd = get_transform("albers_equal_area", params, "forward")
    x, y = fwd(lon, lat)
    tr = Transformer.from_crs(
        "EPSG:4326", "+proj=aea +lat_1=30 +lat_2=60 +ellps=WGS84", always_xy=True
    )
    xr, yr = tr.transform(lon, lat)
    assert np.abs(x - xr).max() < 10.0  # reference METERS_TOL (projcl_test.c:29)
    assert np.abs(y - yr).max() < 10.0


FLOAT32_CASES = [
    ("mercator", ProjectionParams(spheroid=Spheroid.WGS_84)),
    ("albers_equal_area", ProjectionParams(spheroid=Spheroid.WGS_84, rlat1=30.0, rlat2=60.0)),
    ("lambert_conformal_conic", ProjectionParams(spheroid=Spheroid.WGS_84, rlat1=30.0, rlat2=60.0)),
    ("transverse_mercator", ProjectionParams(spheroid=Spheroid.WGS_84, lon0=9.0, scale=0.9996)),
]


@pytest.mark.parametrize("proj,params", FLOAT32_CASES, ids=[c[0] for c in FLOAT32_CASES])
def test_float32_parity_mode_meets_reference_envelope(proj, params):
    """dtype=float32 reproduces the reference's single-precision accuracy
    contract: round-trip within 1 arc-second (README.md:20-28,
    projcl_test.c:28) — the like-for-like benchmarking mode."""
    lon, lat = fixture_points(4000)
    if proj == "transverse_mercator":
        keep = np.abs(lon - params.lon0) < 30.0
        lon, lat = lon[keep], lat[keep]
    fwd = get_transform(proj, params, "forward", dtype=np.float32)
    inv = get_transform(proj, params, "inverse", dtype=np.float32)
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.abs(lon2 - lon).max() < ARCSEC
    assert np.abs(lat2 - lat).max() < ARCSEC


def test_krueger_quarter_meridian_known_value():
    """External anchor: the Krüger rectifying-radius constant must reproduce
    the published WGS84 quarter meridian, 10 001 965.7293 m (Karney 2011)."""
    from projcl_spark.core.spheroid import get_spheroid_info

    info = get_spheroid_info(Spheroid.WGS_84)
    qm = info.krueger_A * info.major_axis * math.pi / 2
    assert abs(qm - 10_001_965.7293) < 1e-3

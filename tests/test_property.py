"""Property-based tests (hypothesis) over the numpy core — random params
beyond the fixed reference matrix."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from projcl_spark.core.params import ProjectionParams
from projcl_spark.core.spheroid import Spheroid
from projcl_spark.geo import datum as dt
from projcl_spark.geo.geodesic import haversine, vincenty_inverse
from projcl_spark.index import cells as C
from projcl_spark.proj import get_transform

ARCSEC = 1.0 / 3600.0

lon_st = st.floats(-55.0, 55.0)
lat_st = st.floats(-35.0, 75.0)


@settings(max_examples=30, deadline=None)
@given(
    sph=st.sampled_from([Spheroid.SPHERE, Spheroid.WGS_84, Spheroid.CLARKE_1866]),
    rlat1=st.floats(5.0, 50.0),
    dlat=st.floats(5.0, 30.0),
    lon0=st.floats(-30.0, 30.0),
    lat0=st.floats(-20.0, 40.0),
)
def test_albers_lcc_roundtrip_random_params(sph, rlat1, dlat, lon0, lat0):
    lon = np.linspace(-50, 50, 200)
    lat = np.linspace(-30, 70, 200)
    p = ProjectionParams(spheroid=sph, rlat1=rlat1, rlat2=rlat1 + dlat,
                         lon0=lon0, lat0=lat0)
    for proj in ("albers_equal_area", "lambert_conformal_conic"):
        fwd = get_transform(proj, p, "forward")
        inv = get_transform(proj, p, "inverse")
        x, y = fwd(lon, lat)
        lon2, lat2 = inv(x, y)
        assert np.abs(lon2 - lon).max() < ARCSEC
        assert np.abs(lat2 - lat).max() < ARCSEC


@settings(max_examples=50, deadline=None)
@given(lon1=lon_st, lat1=lat_st, lon2=lon_st, lat2=lat_st)
def test_vincenty_close_to_haversine(lon1, lat1, lon2, lat2):
    """Ellipsoidal vs spherical distance differ by at most ~0.6%
    (WGS84 flattening + sphere-radius choice)."""
    a = np.array([lon1]), np.array([lat1])
    b = np.array([lon2]), np.array([lat2])
    dh = haversine(a[0], a[1], b[0], b[1])[0]
    dv, _ = vincenty_inverse(a[0], a[1], b[0], b[1])
    if dh > 1000.0:
        assert abs(dv[0] - dh) / dh < 0.006


@settings(max_examples=40, deadline=None)
@given(
    lon=lon_st, lat=lat_st,
    d1=st.sampled_from(list(dt.Datum)),
    d2=st.sampled_from(list(dt.Datum)),
)
def test_datum_shift_invertible_any_pair(lon, lat, d1, d2):
    """The precomposed Helmert matrix of (a→b) is the exact inverse of
    (b→a); closure limited only by the Toms ECEF inverse."""
    lo = np.array([lon]); la = np.array([lat])
    lo1, la1 = dt.shift_datum(lo, la, d1, d2)
    lo2, la2 = dt.shift_datum(lo1, la1, d2, d1)
    # the chain drops ellipsoidal height (as the reference's datum kernels
    # do — pl_datum.opencl carries no h), so large-rotation pairs like
    # ED50↔Italy1940 close only to a few meters; the contract is the
    # reference's own 1-arc-second geodetic envelope (README.md:20-28)
    assert abs(lo2[0] - lon) < ARCSEC
    assert abs(la2[0] - lat) < ARCSEC


@settings(max_examples=50, deadline=None)
@given(lon=st.floats(-179.99, 179.99), lat=st.floats(-89.99, 89.99),
       res=st.integers(0, 20))
def test_cell_contains_point(lon, lat, res):
    cid = C.cell_id_np(np.array([lon]), np.array([lat]), res)
    lo0, la0, lo1, la1 = C.cell_bounds_np(cid, res)
    assert lo0[0] - 1e-9 <= lon <= lo1[0] + 1e-9
    assert la0[0] - 1e-9 <= lat <= la1[0] + 1e-9


@settings(max_examples=30, deadline=None)
@given(lon=st.floats(-179.0, 179.0), lat=st.floats(-89.0, 89.0),
       res=st.integers(2, 12))
def test_neighbors_are_adjacent(lon, lat, res):
    """Every ring-1 neighbor's bounds touch the center cell's bounds —
    longitude adjacency holds modulo 360 (the ring wraps at ±180°)."""
    cid = int(C.cell_id_np(np.array([lon]), np.array([lat]), res)[0])
    lo0, la0, lo1, la1 = (v[0] for v in C.cell_bounds_np(np.array([cid]), res))
    for nb in C.neighbors_np(cid, res, ring=1):
        nlo0, nla0, nlo1, nla1 = (v[0] for v in C.cell_bounds_np(np.array([nb]), res))
        lon_touches = any(
            nlo1 + s >= lo0 - 1e-9 and nlo0 + s <= lo1 + 1e-9
            for s in (-360.0, 0.0, 360.0)
        )
        assert lon_touches
        assert nla1 >= la0 - 1e-9 and nla0 <= la1 + 1e-9


@settings(max_examples=12, deadline=None)
@given(res=st.integers(1, 5))
def test_hilbert_bijection_adjacency_all_res(res):
    """For every resolution, the Hilbert map is a bijection onto
    [0, 4^res) and consecutive ids are always grid-adjacent (manhattan
    step 1) — exhaustively over the full lattice."""
    from projcl_spark.index.hilbert import hilbert_np

    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_np(xs.ravel(), ys.ravel(), res)
    assert np.array_equal(np.sort(d), np.arange(n * n))
    order = np.argsort(d)
    steps = (np.abs(np.diff(xs.ravel()[order]))
             + np.abs(np.diff(ys.ravel()[order])))
    assert (steps == 1).all()


@settings(max_examples=40, deadline=None)
@given(lon=st.floats(-180.0, 180.0), lat=st.floats(-90.0, 90.0),
       precision=st.integers(1, 12))
def test_geohash_sql_matches_reference_bits(lon, lat, precision):
    """oracle.geohash_stages (the SQL both engines share, evaluated here
    by DuckDB) == an independent pure-Python big-int geohash at any
    precision and any coordinate, including the poles/antimeridian
    clamps and the p≥11 range where a float64 morton would corrupt."""
    import duckdb

    from projcl_spark import oracle as O

    total = 5 * precision
    lonbits, latbits = (total + 1) // 2, total // 2
    lonv = min(int(np.floor((lon + 180.0) / 360.0 * (1 << lonbits))),
               (1 << lonbits) - 1)
    latv = min(int(np.floor((lat + 90.0) / 180.0 * (1 << latbits))),
               (1 << latbits) - 1)
    bits = []
    li, ti = lonbits - 1, latbits - 1
    for j in range(total):
        if j % 2 == 0:
            bits.append((lonv >> li) & 1)
            li -= 1
        else:
            bits.append((latv >> ti) & 1)
            ti -= 1
    want = "".join(
        O.GEOHASH32[int("".join(map(str, bits[5 * i:5 * i + 5])), 2)]
        for i in range(precision))
    g = O.geohash_stages(precision)
    # CAST the literals: in real usage {lon}/{lat} are DOUBLE columns, but
    # a bare SQL literal like 180.0 stays DECIMAL in DuckDB and the
    # stage arithmetic then overflows the inferred decimal width
    lon_e = f"CAST({lon!r} AS DOUBLE)"
    lat_e = f"CAST({lat!r} AS DOUBLE)"
    q = (f"WITH v AS (SELECT {g['lonv'].format(lon=lon_e)} AS lonv, "
         f"{g['latv'].format(lat=lat_e)} AS latv) "
         f"SELECT {g['gh'].format(lonv='lonv', latv='latv')} AS gh FROM v")
    got = duckdb.connect().execute(q).fetchone()[0]
    assert got == want, (lon, lat, precision, got, want)

"""Round-5 operators: geohash addressing, bbox join, Visvalingam
simplification, shingle containment."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_geohash_classic_vectors(spark):
    """The published reference vectors every geohash implementation is
    checked against — including p=11, which catches any float64 route
    for the morton code (low bits past 2^53 corrupt silently)."""
    from projcl_spark.index.geohash import with_geohash

    df = spark.createDataFrame(
        [(0, 10.40744, 57.64911), (1, -5.6, 42.6), (2, 0.0, 0.0),
         (3, -179.9999, -89.9999), (4, 179.9999, 89.9999)],
        "i long, lon double, lat double")
    got11 = {r["i"]: r["gh"] for r in with_geohash(df, precision=11).collect()}
    got5 = {r["i"]: r["gh"] for r in with_geohash(df, precision=5).collect()}
    assert got11[0] == "u4pruydqqvj"
    assert got5[0] == "u4pru" and got5[1] == "ezs42"
    assert got5[2] == "s0000"          # origin
    assert got5[3].startswith("0")     # SW corner of the base grid
    assert got5[4].startswith("z")     # NE corner


def test_geohash_prefix_is_coarsening(spark):
    """p=3 encode == prefix of the p=6 encode for every point (the
    truncation property rollups rely on)."""
    from projcl_spark.index.geohash import with_geohash
    from projcl_spark.sources import synth

    pts = synth.geo_points(spark, 200)
    both = with_geohash(with_geohash(pts, precision=6, out="g6"),
                        precision=3, out="g3")
    bad = both.where(F.substring("g6", 1, 3) != F.col("g3")).count()
    assert bad == 0


def test_bbox_join_matches_bruteforce(spark):
    """Grid-cell equi-join + canonical-cell dedup == brute-force theta
    join, pair-for-pair (no duplicates, no misses), on a layer with
    boxes spanning multiple cells and exact shared-edge touches."""
    from projcl_spark.operators.bbox import bbox_join, bbox_join_bruteforce

    rng = np.random.RandomState(7)
    def layer(n, scale):
        rows = []
        for i in range(n):
            cx, cy = rng.uniform(-60, 60), rng.uniform(-40, 40)
            w, h = rng.uniform(0.5, scale), rng.uniform(0.5, scale)
            rows.append((i, cx - w, cx + w, cy - h, cy + h))
        return rows
    a_rows, b_rows = layer(80, 12.0), layer(40, 18.0)
    # exact shared-edge touch: b box 0 starts where a box 0 ends
    ax = a_rows[0]
    b_rows[0] = (0, ax[2], ax[2] + 3.0, ax[3], ax[4])
    schema = "id_{} long, lon_min double, lon_max double, lat_min double, lat_max double"
    a = spark.createDataFrame(a_rows, schema.format("a"))
    b = spark.createDataFrame(b_rows, schema.format("b"))
    fast = bbox_join(a, b, cell_deg=8.0)
    slow = bbox_join_bruteforce(a, b)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    n = fast.count()
    assert n == fast.distinct().count()  # canonical-cell dedup left no dups
    assert n > 0
    # the shared-edge pair is IN (closed envelopes)
    assert fast.where((F.col("id_a") == 0) & (F.col("id_b") == 0)).count() == 1


def test_simplify_vw_exact_small_track(spark):
    """Hand-checkable 5-point track in integer µdeg: endpoints always
    survive with area2 = −1; interior points filter on the exact
    doubled-triangle-area integer."""
    from projcl_spark.operators.trajectory import simplify_vw

    # (t, x, y): collinear middle point at t=2 (area 0), a 1e12-area
    # detour at t=3
    rows = [(1, 1, 0, 0), (1, 2, 1_000_000, 1_000_000),
            (1, 3, 2_000_000, 2_000_000), (1, 4, 3_000_000, 2_000_000),
            (1, 5, 4_000_000, 2_000_000)]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, x_e6 long, y_e6 long")
    out = {r["t_us"]: r["area2"] for r in
           simplify_vw(df, key="user_id", ts="t_us",
                       min_area2=1).collect()}
    # t=2 collinear (area 0) dropped; t=4 collinear with 3,5 dropped
    assert set(out) == {1, 3, 5}
    assert out[1] == -1 and out[5] == -1
    # t=3 doubled area: |(2e6-1e6)(2e6-1e6) - (3e6-1e6)(2e6-1e6)| = 1e12
    assert out[3] == 10**12
    # threshold above that kills it too
    kept = simplify_vw(df, key="user_id", ts="t_us",
                       min_area2=10**12 + 1).collect()
    assert {r["t_us"] for r in kept} == {1, 5}


def test_containment_vs_jaccard_asymmetry(spark):
    """containment(A⊂B → 1e6) where Jaccard < 1e6 — the metric's reason
    to exist; SQL runs on the Spark dialect directly."""
    from projcl_spark.operators.text import containment_sql, jaccard_sql

    df = spark.createDataFrame(
        [(["a", "b"], ["a", "b", "c", "d"])], "sa array<string>, sb array<string>")
    df.createOrReplaceTempView("cj")
    row = spark.sql(
        f"SELECT {containment_sql('sa', 'sb', 'spark')} AS c, "
        f"{jaccard_sql('sa', 'sb', 'spark')} AS j FROM cj").collect()[0]
    assert row["c"] == 1_000_000 and row["j"] == 500_000


def test_utm_autozone_published_vectors(spark):
    """WGS-84 UTM against externally published coordinates (±1 m):
    the CN Tower (zone 17N) and the Sydney Opera House (zone 56 south,
    false northing 10 000 km), plus the zone rule at the antimeridian
    (+180° ≡ −180° → zone 1) and |λ−λ0| ≤ 3° for every sampled point."""
    from projcl_spark.oracle import utm_fwd_sql

    z_e, x_e, y_e = utm_fwd_sql("lon", "lat")
    df = spark.createDataFrame(
        [(0, -79.387139, 43.642567),   # CN Tower: 17N 630084 4833439
         (1, 151.215297, -33.856159),  # Opera House: zone 56, south
         (2, 151.215297, 33.856159),   # mirror point, north
         (3, 180.0, 10.0), (4, -180.0, 10.0)],
        "i long, lon double, lat double")
    rows = {r["i"]: r for r in df.selectExpr(
        "i", f"{z_e} AS z", f"{x_e} AS x", f"{y_e} AS y").collect()}
    assert rows[0]["z"] == 17
    assert abs(rows[0]["x"] - 630084.0) < 1.0
    assert abs(rows[0]["y"] - 4833439.0) < 2.0
    assert rows[1]["z"] == 56
    # hemisphere mirror: same easting; south northing = 1e7 − |north|
    assert abs(rows[1]["x"] - rows[2]["x"]) < 1e-6
    assert abs(rows[1]["y"] - (10_000_000.0 - rows[2]["y"])) < 1e-6
    assert rows[3]["z"] == 1 and rows[4]["z"] == 1
    assert abs(rows[3]["x"] - rows[4]["x"]) < 1e-6  # same point, same zone

    # every zone's central meridian is within 3° of its points
    import numpy as np
    rng = np.random.default_rng(3)
    pts = spark.createDataFrame(
        [(float(lo), float(la)) for lo, la in zip(
            rng.uniform(-180, 180, 300), rng.uniform(-80, 80, 300))],
        "lon double, lat double")
    bad = pts.selectExpr(f"{z_e} AS z", "lon").where(
        "abs(lon - (CAST(z AS DOUBLE) * 6.0 - 183.0)) > 3.0000001").count()
    assert bad == 0


def test_quadkey_published_vector_and_prefix(spark):
    """The Bing docs example (tile 3,5 at level 3 → '213'), the
    prefix-is-ancestor property against an independent zoom-3 encode,
    and digit-set sanity at zoom 6."""
    from projcl_spark.index.tiles import tile_assign, with_quadkey
    from projcl_spark.oracle import quadkey_sql
    from projcl_spark.sources import synth

    row = spark.sql(f"SELECT {quadkey_sql('3', '5', 3)} AS qk").collect()[0]
    assert row["qk"] == "213"

    pts = synth.geo_points(spark, 300)
    both = with_quadkey(with_quadkey(pts, zoom=6, out="q6"),
                        zoom=3, out="q3")
    assert both.where(F.substring("q6", 1, 3) != F.col("q3")).count() == 0
    assert both.where(
        "length(q6) <> 6 OR translate(q6, '0123', '') <> ''").count() == 0

    # quadkey agrees with tile_assign's (tx, ty) digit-for-digit
    t = tile_assign(with_quadkey(pts, zoom=5, out="q5"),
                    zoom=5, tile_px=1)
    recon = f"{quadkey_sql('tx', 'ty', 5)}"
    assert t.where(F.expr(recon) != F.col("q5")).count() == 0


def test_hexbin_nearest_center_property(spark):
    """Cube rounding's defining property: the assigned hex center is the
    NEAREST center — strictly closer than all six neighbors (ties are
    measure-zero for md5-ish random points).  Verified in numpy against
    the axial→cartesian formulas, plus the cube-sum invariant."""
    from projcl_spark.index.hexbin import with_hexbin

    s = 3.0
    rng = np.random.RandomState(11)
    pts = [(float(x), float(y)) for x, y in
           zip(rng.uniform(-170, 170, 400), rng.uniform(-85, 85, 400))]
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = with_hexbin(df, size_deg=s).collect()
    rt3 = np.sqrt(3.0)
    for row in got:
        x, y, q, r = row["lon"], row["lat"], row["hq"], row["hr"]
        # axial -> cartesian center (pointy-top)
        cx, cy = s * rt3 * (q + r / 2.0), s * 1.5 * r
        d0 = np.hypot(x - cx, y - cy)
        for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
            nx = s * rt3 * ((q + dq) + (r + dr) / 2.0)
            ny = s * 1.5 * (r + dr)
            assert d0 <= np.hypot(x - nx, y - ny) + 1e-9, (x, y, q, r)
        # a point is never farther than one hex circumradius from its center
        assert d0 <= s + 1e-9


def test_ann_recall_bounds_and_self_recall(spark):
    """Every sampled query appears exactly once with 0 ≤ n_hit ≤ n_exact
    ≤ k; and measuring exact-vs-exact gives perfect recall (the metric's
    fixed point)."""
    import __spark_entry__ as E
    from projcl_spark.operators.ann import cosine_topk

    sf_dir = "/root/testdata/sf0.001"
    out = E.q_ann_recall(spark, sf_dir).collect()
    assert len(out) == E.ANN_NQ
    for r in out:
        assert 0 <= r["n_hit"] <= r["n_exact"] <= E.ANN_K

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 4)
    ex = cosine_topk(qs, emb, k=3).select("query_id", "neighbor_id")
    ls = ex.withColumn("hit", F.lit(1))
    perfect = (ex.join(ls, ["query_id", "neighbor_id"], "left")
               .groupBy("query_id")
               .agg(F.sum("hit").alias("n_hit")).collect())
    assert all(r["n_hit"] == 3 for r in perfect)


def test_rhumb_published_vector_and_invariants(spark):
    """The Movable-Type worked example (Dover->Calais class: here the
    classic 50°21'50"N 4°09'25"W -> 42°21'04"N 71°02'27"W leg): rhumb
    distance 5197.9 km and course 260°07'38" at R=6371 km; plus the
    ordering invariant (a rhumb line never beats the great circle) and
    east-west / meridian exactness on random points."""
    from projcl_spark.geo.geodesic import haversine, rhumb_inverse

    p1 = (-(4 + 9 / 60 + 25 / 3600), 50 + 21 / 60 + 50 / 3600)
    p2 = (-(71 + 2 / 60 + 27 / 3600), 42 + 21 / 60 + 4 / 3600)
    d, c = rhumb_inverse(p1[0], p1[1], p2[0], p2[1], radius=6371000.0)
    assert abs(d - 5197900.0) < 2000.0, d
    assert abs(c - (260 + 7 / 60 + 38 / 3600)) < 0.05, c

    rng = np.random.default_rng(7)
    lon1, lon2 = rng.uniform(-60, 60, 500), rng.uniform(-60, 60, 500)
    lat1, lat2 = rng.uniform(-40, 80, 500), rng.uniform(-40, 80, 500)
    dr, _ = rhumb_inverse(lon1, lat1, lon2, lat2)
    dg = haversine(lon1, lat1, lon2, lat2)
    assert (dr >= dg - 1e-6).all()
    # along a meridian the rhumb IS the great circle
    dm, cm = rhumb_inverse(lon1, lat1, lon1, lat1 + 5.0)
    assert np.allclose(dm, haversine(lon1, lat1, lon1, lat1 + 5.0), rtol=1e-12)
    assert np.allclose(cm, 0.0)
    # due east at the equator: course 90, distance = R * dlam
    de, ce = rhumb_inverse(10.0, 0.0, 20.0, 0.0)
    assert abs(ce - 90.0) < 1e-9
    assert abs(de - 6370997.0 * np.radians(10.0)) < 1e-6


def test_rhumb_sql_matches_numpy(spark):
    """The staged dialect-free SQL (oracle.rhumb_stages) IS the numpy
    implementation: pin the Spark codegen rendering row-by-row."""
    from projcl_spark import oracle as O
    from projcl_spark.geo.geodesic import rhumb_inverse

    rng = np.random.default_rng(11)
    n = 300
    pdf = {
        "i": list(range(n)),
        "lon1": rng.uniform(-60, 60, n).tolist(),
        "lat1": rng.uniform(-40, 80, n).tolist(),
        "lon2": rng.uniform(-60, 60, n).tolist(),
        "lat2": rng.uniform(-40, 80, n).tolist(),
    }
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(pdf))
    for stage in O.rhumb_stages("lon1", "lat1", "lon2", "lat2"):
        df = df.withColumns({k: F.expr(t) for k, t in stage.items()})
    got = df.select("i", "rhumb_m", "rhumb_course").toPandas().set_index("i")
    want_d, want_c = rhumb_inverse(
        np.array(pdf["lon1"]), np.array(pdf["lat1"]),
        np.array(pdf["lon2"]), np.array(pdf["lat2"]))
    assert np.allclose(got["rhumb_m"].to_numpy(), want_d, rtol=1e-12, atol=1e-6)
    assert np.allclose(got["rhumb_course"].to_numpy(), want_c,
                       rtol=1e-12, atol=1e-9)


def test_nearest_facility_matches_bruteforce_and_plan(spark):
    """Fold argmin == numpy brute force (incl. the first-min tie rule);
    the assignment itself adds ZERO exchanges (only the rollup a caller
    adds shuffles)."""
    import re

    from projcl_spark.geo.geodesic import haversine
    from projcl_spark.operators.allocate import nearest_facility
    from projcl_spark.sources import synth

    def keyed(df):
        return df.withColumn(
            "k", F.concat_ws("#", "doc_id", F.col("offset").cast("string")))

    pts = keyed(synth.geo_points(spark, 150))
    fac = (keyed(synth.geo_points(spark, 11))
           .selectExpr("abs(hash(k)) AS fid", "lon AS flon", "lat AS flat")
           .dropDuplicates(["fid"]))
    got = (nearest_facility(pts, fac, fac_id="fid", fac_lon="flon",
                            fac_lat="flat")
           .toPandas().sort_values("k").reset_index(drop=True))
    fp = fac.toPandas().sort_values("fid").reset_index(drop=True)
    pp = pts.toPandas().sort_values("k").reset_index(drop=True)
    d = haversine(pp.lon.values[:, None], pp.lat.values[:, None],
                  fp.flon.values[None, :], fp.flat.values[None, :])
    want = fp.fid.values[d.argmin(axis=1)]  # argmin keeps the first min
    assert (got.facility.values == want).all()
    assert (got.dist_m.values >= 0).all() and (got.facility.values >= 0).all()

    plan = (nearest_facility(pts, fac, fac_id="fid", fac_lon="flon",
                             fac_lat="flat")
            ._jdf.queryExecution().executedPlan().toString())
    assert not re.search(r"Exchange", plan), "assignment must not shuffle"


def test_nearest_facility_guard_trips(spark):
    from projcl_spark.operators.allocate import nearest_facility
    from projcl_spark.operators.layer_guard import LayerTooLargeError
    from projcl_spark.sources import synth

    pts = synth.geo_points(spark, 10)
    fac = (synth.geo_points(spark, 50)
           .selectExpr("abs(hash(doc_id, offset)) AS fid",
                       "lon AS flon", "lat AS flat"))
    import pytest

    with pytest.raises(LayerTooLargeError):
        nearest_facility(pts, fac, fac_id="fid", fac_lon="flon",
                         fac_lat="flat", max_facilities=10)


def test_mgrs_published_vectors(spark):
    """CN Tower 17TPJ (odd zone, north) and Sydney Opera House 56HLH
    (EVEN zone row offset, southern false northing) — the two vectors
    that pin every arm of the lettering scheme; plus 1-km digit check
    against the pinned UTM easting/northing and the band ladder edges."""
    from projcl_spark.index.mgrs import with_mgrs

    df = spark.createDataFrame(
        [(0, -79.387057, 43.642566),   # CN Tower -> 17T PJ 30 33 (1 km)
         (1, 151.21527, -33.85719),    # Sydney Opera House -> 56H LH 34 52
         (2, 9.0, 71.9), (3, 9.0, 72.1)],  # band W/X fence at 72N
        "i long, lon double, lat double")
    got = {r["i"]: r for r in with_mgrs(df).collect()}
    cn, syd = got[0], got[1]
    assert cn["zone"] == 17 and cn["m_band"] == "T" and cn["m_sq"] == "PJ"
    # 630084E 4833438N -> km digits 30 / 33
    assert cn["mgrs"] == "17TPJ3033", cn["mgrs"]
    assert syd["zone"] == 56 and syd["m_band"] == "H" and syd["m_sq"] == "LH"
    # 334786E 6252080N -> km digits 34 / 52
    assert syd["mgrs"] == "56HLH3452", syd["mgrs"]
    assert got[2]["m_band"] == "W" and got[3]["m_band"] == "X"


def test_grid_shift_bilinear_exactness_and_plan(spark):
    """At a node the interpolated offset IS the node offset; at a cell
    center it is the 4-corner mean; out-of-grid points clamp to the edge
    cell.  The corner fetches must be broadcast joins with no shuffle
    exchange on the point side."""
    import re

    from projcl_spark.geo.gridshift import grid_shift, synthetic_grid

    nx = ny = 25
    kw = dict(lon0=-60.0, lat0=-40.0, step=5.0, nx=nx, ny=ny)
    grid = synthetic_grid(spark, nx, ny)
    gp = grid.toPandas().set_index(["i", "j"])

    # node (i=2, j=3) -> lon -50, lat -25; center of cell (2,3) -> -47.5, -22.5
    pts = spark.createDataFrame(
        [(0, -50.0, -25.0), (1, -47.5, -22.5), (2, -999.0, 999.0)],
        "k long, lon double, lat double")
    out = {r["k"]: r for r in grid_shift(pts, grid, **kw).collect()}

    de_node = gp.loc[(2, 3), "de_as"]
    assert abs((out[0]["slon"] + 50.0) * 3600.0 - de_node) < 1e-9
    corners = [gp.loc[(2 + dx, 3 + dy), "dn_as"]
               for dx in (0, 1) for dy in (0, 1)]
    assert abs((out[1]["slat"] + 22.5) * 3600.0 - np.mean(corners)) < 1e-9
    # clamped: the far-out point interpolates the far corner cell and
    # still gets a bounded (<= 1 arcsec) offset
    assert abs(out[2]["slon"] + 999.0) <= 1.0 / 3600.0 + 1e-12

    plan = (grid_shift(pts, grid, **kw)
            ._jdf.queryExecution().executedPlan().toString())
    assert len(re.findall(r"BroadcastHashJoin", plan)) == 4
    assert not re.search(r"ShuffleExchange|Exchange hashpartitioning", plan)


def test_polyline_published_google_vector(spark):
    """The Google dev-guide worked example: (38.5,-120.2), (40.7,-120.95),
    (43.252,-126.453) -> the dev-guide string; plus the
    single-chunk zero delta ('?') and a negative-delta round trip."""
    from projcl_spark.operators.trajectory import polyline_encode

    df = spark.createDataFrame(
        [(1, 1, -120.2, 38.5), (1, 2, -120.95, 40.7),
         (1, 3, -126.453, 43.252),
         (2, 1, 0.0, 0.0), (2, 2, 0.0, 0.0)],   # zero deltas
        "user_id long, event_id long, lon double, lat double")
    df = df.withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {r["user_id"]: r["polyline"]
           for r in polyline_encode(df).collect()}
    assert got[1] == "_p~iF~ps|U_ulLnnqC_mqNvxq`@", got[1]
    assert got[2] == "????", got[2]  # 2 points x (lat,lon) zero chunks


def test_polyline_decodes_back_exactly(spark):
    """Decode the engine's output with an independent pure-python decoder
    and recover every quantized coordinate exactly."""
    from projcl_spark.operators.trajectory import polyline_encode
    from projcl_spark.sources import synth

    def decode(s):
        vals, i = [], 0
        while i < len(s):
            v, shift = 0, 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                v |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            vals.append(~(v >> 1) if v & 1 else v >> 1)
        out, lat, lon = [], 0, 0
        for k in range(0, len(vals), 2):
            lat += vals[k]
            lon += vals[k + 1]
            out.append((lat, lon))
        return out

    pts = (synth.geo_points(spark, 60)
           .withColumn("user_id", F.abs(F.hash("doc_id")) % 5)
           .withColumn("event_id", F.abs(F.hash("doc_id", "offset")))
           .withColumn("ts", (F.col("event_id") % 10_000).cast("timestamp"))
           .dropDuplicates(["user_id", "ts", "event_id"]))
    enc = polyline_encode(pts).collect()
    want = {}
    for r in pts.selectExpr(
            "user_id", "ts", "event_id",
            "CAST(floor(lat * 100000.0 + 0.5) AS BIGINT) AS la",
            "CAST(floor(lon * 100000.0 + 0.5) AS BIGINT) AS lo").collect():
        want.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["la"], r["lo"]))
    for r in enc:
        exp = [(la, lo) for _, _, la, lo in sorted(want[r["user_id"]])]
        assert decode(r["polyline"]) == exp, r["user_id"]
        assert r["n_pts"] == len(exp)

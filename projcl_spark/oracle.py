"""Oracle-SQL twins: closed-form ANSI SQL for every forward projection.

The driver's correctness gate runs each Spark query side-by-side with a
DuckDB SQL oracle (same parquet inputs) and value-hashes the results.  For
every projection the engine executes as an Arrow-batched pandas UDF, this
module emits the *same math* as a SQL expression with the per-projection
constants folded in as literals — computed by the very same ``prepare()``
the UDF closure uses, so the oracle and the engine share one source of
truth for (n, c, rho0, Krüger α, …).

EVERY inverse also gets a direct value oracle: closed-form where the math
allows (spherical Mercator/LAEA/Albers/LCC/TMerc, ellipsoidal LAEA),
fixed-unroll fixed-point (ellipsoidal Mercator/LCC via ``phi2``;
Stereographic-e sph2ell; Vincenty), and exact unrolls of the engine's own
fixed-round Newton loops as staged CTEs (Krüger, Albers-e ``_phi1``,
Polyconic 2-D Newton s+e, Winkel 2-D Newton, Robinson node-walk + root
polish).  The arcsec round-trip-closure query (reference oracle style,
``/root/reference/test/projcl_test.c:648-669``) additionally covers every
case as an invariant.

Dialect notes (DuckDB): no ``asinh``/``atanh``/``sinh``/``cosh`` — emitted
as ``ln``/``exp`` identities; hex→bigint is ``CAST('0x…' AS BIGINT)``
(Spark: ``conv(…,16,10)``).  Both engines evaluate IEEE float64, so results
match the numpy core to a few ulp; queries quantize (``round``) outputs so
value-hashes are stable.
"""

from __future__ import annotations

import math

from .core.params import ProjectionParams
from .proj import _MODULES, resolve
from .proj.robinson import C1 as ROB_C1
from .proj.robinson import FXC, FYC, NODES
from .proj.robinson import RC1 as ROB_RC1
from .proj.robinson import _X as ROB_X
from .proj.robinson import _Y as ROB_Y

U60 = float(1 << 60)

# ------------------------------------------------------------ primitives ---


def _r(v: float) -> str:
    """Full-precision float64 literal.

    Scientific notation (17 significant digits round-trips float64 exactly)
    — the exponent forces both DuckDB and Spark to parse it as DOUBLE rather
    than DECIMAL (DuckDB's DECIMAL(18) overflows on long plain literals).
    """
    return f"{float(v):.17e}"


def asinh_s(x: str) -> str:
    return f"ln({x} + sqrt(({x})*({x}) + 1.0))"


def atanh_s(x: str) -> str:
    return f"(0.5 * ln((1.0 + {x}) / (1.0 - {x})))"


def sinh_s(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2)"


def cosh_s(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2)"


def hash60(key: str, dialect: str) -> str:
    """Deterministic uniform bigint in [0, 2^60) from a string SQL expr.

    Must be bit-identical across Spark SQL and DuckDB (verified in tests).
    """
    if dialect == "spark":
        return f"CAST(conv(substr(md5({key}), 1, 15), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substring(md5({key}), 1, 15)) AS BIGINT)"


def unit(key: str, dialect: str) -> str:
    """Uniform double in [0, 1) from a string SQL expr."""
    return f"({hash60(key, dialect)} / {_r(U60)})"


def derived_lonlat(key: str, dialect: str,
                   lon_rng=(-60.0, 60.0), lat_rng=(-40.0, 80.0)) -> tuple[str, str]:
    """Deterministic (lon, lat) inside the reference test envelope
    (projcl_test.c:31-35) from a row key — the geo derivation both the
    engine queries and the DuckDB oracles share."""
    u_lon = unit(f"'lon:' || {key}", dialect)
    u_lat = unit(f"'lat:' || {key}", dialect)
    lon = f"({_r(lon_rng[0])} + {_r(lon_rng[1] - lon_rng[0])} * {u_lon})"
    lat = f"({_r(lat_rng[0])} + {_r(lat_rng[1] - lat_rng[0])} * {u_lat})"
    return lon, lat


def haversine(lon1: str, lat1: str, lon2: str, lat2: str, radius: float = 6370997.0) -> str:
    """Same formula as ``pl_inverse_geodesic_s`` (kernel/pl_geodesic.opencl:31-59);
    runs on both engines unchanged."""
    return (
        f"2.0 * {_r(radius)} * asin(sqrt(least(greatest("
        f"pow(sin((radians({lat2}) - radians({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin((radians({lon2}) - radians({lon1})) / 2), 2), 0.0), 1.0)))"
    )


def cross_track(lon: str, lat: str,
                lon1: float, lat1: float, lon2: float, lat2: float,
                radius: float = 6370997.0) -> tuple[str, str]:
    """Signed cross-track + unsigned along-track distance (m) from a point
    column to the great circle through route (lon1,lat1)->(lon2,lat2) —
    the navigation classic (engine-added; the reference computes
    point-to-point geodesics, src/projcl_run.c:654-656, never
    point-to-path).  Standard spherical formulas: dxt = asin(sin(c13) *
    sin(th13 - th12)) * R, dat = acos(cos(c13) / cos(dxt/R)) * R, with
    the route's bearing th12 and the trig of its origin CONSTANT-FOLDED
    in Python so the runtime text only touches the point columns.  One
    expression text feeds the Spark codegen path (via F.expr) and the
    DuckDB oracle, keeping both engines on the same operation order."""
    import math as _m

    lam1, phi1 = _m.radians(lon1), _m.radians(lat1)
    lam2, phi2 = _m.radians(lon2), _m.radians(lat2)
    th12 = _m.atan2(
        _m.sin(lam2 - lam1) * _m.cos(phi2),
        _m.cos(phi1) * _m.sin(phi2)
        - _m.sin(phi1) * _m.cos(phi2) * _m.cos(lam2 - lam1),
    )
    sp1, cp1 = _m.sin(phi1), _m.cos(phi1)
    dlam = f"(radians({lon}) - {_r(lam1)})"
    phi3 = f"radians({lat})"
    h = (f"least(greatest("
         f"pow(sin(({phi3} - {_r(phi1)}) / 2), 2)"
         f" + {_r(cp1)} * cos({phi3}) * pow(sin({dlam} / 2), 2), 0.0), 1.0)")
    c13 = f"(2.0 * asin(sqrt({h})))"
    th13 = (f"atan2(sin({dlam}) * cos({phi3}), "
            f"{_r(cp1)} * sin({phi3}) - {_r(sp1)} * cos({phi3}) * cos({dlam}))")
    x = (f"least(greatest(sin({c13}) * sin({th13} - {_r(th12)}),"
         f" -1.0), 1.0)")
    dxt = f"(asin({x}) * {_r(radius)})"
    dat = (f"(acos(least(greatest(cos({c13}) / cos(asin({x})),"
           f" -1.0), 1.0)) * {_r(radius)})")
    return dxt, dat


def spherical_direct(lon: str, lat: str, az_deg: str, dist_m: str,
                     radius: float = 6370997.0) -> tuple[str, str]:
    """Forward geodesic, spherical (kernel/pl_geodesic.opencl:61-122) as SQL."""
    sd = f"({dist_m} / {_r(radius)})"
    phi1 = f"radians({lat})"
    az = f"radians({az_deg})"
    sinphi2 = f"(sin({phi1}) * cos({sd}) + cos({phi1}) * sin({sd}) * cos({az}))"
    lat2 = f"degrees(asin(least(greatest({sinphi2}, -1.0), 1.0)))"
    lon2 = (
        f"degrees(radians({lon}) + atan2(sin({az}) * sin({sd}) * cos({phi1}), "
        f"cos({sd}) - sin({phi1}) * {sinphi2}))"
    )
    return lon2, lat2


def pixel_sql(px: str, py: str, dialect: str = "duck", channel: int = 0) -> str:
    """The synthetic mosaic's pixel intensity as SQL — the analytic twin of
    ``sources.synth.pixel_value`` (value depends only on GLOBAL coords +
    channel, so oracles verify tiled sampling without reconstructing the
    tile table).  ``channel=0`` is byte-identical to the historical
    single-band formula."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    salt = "px:" if channel == 0 else f"px{channel}:"
    key = f"'{salt}' || CAST({px} AS {s}) || ':' || CAST({py} AS {s})"
    return (f"(({px} * 3 + {py} * 7 + {channel * 11} + "
            f"({hash60(key, dialect)} % 32)) % 256)")


def mercator_inv_sql(params: ProjectionParams, x: str, y: str) -> tuple[str, str]:
    """Spherical-Mercator INVERSE as SQL (closed-form, unlike the iterative
    ellipsoidal inverses) — lets the warp-pipeline oracle chain
    dst-inverse → src-forward entirely in DuckDB."""
    from .proj import mercator

    C = mercator.prepare(params)
    if not C["spherical"]:
        raise ValueError("only the spherical Mercator inverse is closed-form SQL")
    xs = f"(({x} - {_r(C['x0'])}) / {_r(C['scale'])})"
    ys = f"(({y} - {_r(C['y0'])}) / {_r(C['scale'])})"
    return f"degrees({xs})", f"degrees(atan({sinh_s(ys)}))"


# ----------------------------------------------------------- datum shift ---


def datum_shift_stages_sql(src, dst) -> list[tuple[str, dict[str, str]]]:
    """The composed datum shift (reference ops #14–17) as THREE staged SQL
    select-lists — dialect-common (trig/sqrt/atan2/CASE only), consumed by
    both the Spark codegen path (``functions.datum_shift_cols``) and the
    DuckDB oracle.  Matrix entries and spheroid constants are folded in as
    literals (the reference's host-side LAPACK/BLAS precompose,
    ``src/projcl_run.c:823-909``, happens here via numpy).

    Input columns: lon, lat (degrees).  Stages:
      1. geodetic→ECEF on the source spheroid (h = 0);
      2. precomposed 4×4 Helmert;
      3. ECEF→geodetic, Toms 1996 (kernel/pl_datum.opencl:57-108 semantics).
    """
    from .geo.datum import AD_C, DATUM_SPHEROID, combined_matrix
    from .core.spheroid import Spheroid, get_spheroid_info

    src_info = get_spheroid_info(DATUM_SPHEROID.get(src, Spheroid.WGS_84))
    dst_info = get_spheroid_info(DATUM_SPHEROID.get(dst, Spheroid.WGS_84))
    M = combined_matrix(src, dst)

    sp = "sin(radians(lat))"
    cp = "cos(radians(lat))"
    r = f"({_r(src_info.major_axis)} / sqrt(1.0 - {_r(src_info.ecc2)} * {sp} * {sp}))"
    s1 = {
        "ex": f"({r} * {cp} * cos(radians(lon)))",
        "ey": f"({r} * {cp} * sin(radians(lon)))",
        "ez": f"({r} * {_r(src_info.one_ecc2)} * {sp})",
    }

    def row(i: int) -> str:
        return (f"({_r(M[i, 0])} * ex + {_r(M[i, 1])} * ey + "
                f"{_r(M[i, 2])} * ez + {_r(M[i, 3])})")

    s2 = {"tx": row(0), "ty": row(1), "tz": row(2)}

    a, b = _r(dst_info.major_axis), _r(dst_info.minor_axis)
    es, one_es = dst_info.ecc2, dst_info.one_ecc2
    w = "sqrt(tx * tx + ty * ty)"
    s0 = f"sqrt((tz * {_r(AD_C)}) * (tz * {_r(AD_C)}) + {w} * {w})"
    sin_b0 = f"((tz * {_r(AD_C)}) / {s0})"
    cos_b0 = f"({w} / {s0})"
    t1 = f"(tz + {b} * {_r(es / one_es)} * {sin_b0} * {sin_b0} * {sin_b0})"
    total = f"({w} - {a} * {_r(es)} * {cos_b0} * {cos_b0} * {cos_b0})"
    s3 = {
        "dlon": "degrees(atan2(ty, tx))",
        "dlat": f"degrees(atan2({t1}, {total}))",
    }
    return [("ecef", s1), ("helmert", s2), ("geodetic", s3)]


# ------------------------------------------------- forward projection SQL ---


def _qsfn_s(s: str, e: float, one_es: float) -> str:
    con = f"({_r(e)} * {s})"
    return f"({_r(one_es)} * ({s} / (1.0 - {con} * {con}) + {atanh_s(con)} / {_r(e)}))"


def _tmerc_e_body_sql(lam: str, phi: str, C: dict) -> tuple[str, str]:
    """Krüger order-4 ellipsoidal forward body (unscaled η', ξ').

    ``lam`` may be any SQL expression — a folded constant for the fixed
    central-meridian cases (``fwd_xy_sql``) or a per-row zone meridian
    (``utm_fwd_sql``).  Same series as ``proj/transverse_mercator.forward``
    (reference kernel ``pl_project_transverse_mercator.opencl``)."""
    e = _r(C["ecc"])
    a = C["alpha"]
    tau = f"tan({phi})"
    sigma = sinh_s(f"({e} * {atanh_s(f'({e} * {tau} / sqrt(1.0 + {tau} * {tau}))')})")
    tau1 = f"({tau} * sqrt(1.0 + {sigma} * {sigma}) - {sigma} * sqrt(1.0 + {tau} * {tau}))"
    xi = f"atan2({tau1}, cos({lam}))"
    eta = asinh_s(f"(sin({lam}) / sqrt({tau1} * {tau1} + cos({lam}) * cos({lam})))")
    y_terms = " + ".join(
        f"{_r(a[i])} * sin({2 * (i + 1)} * {xi}) * {cosh_s(f'({2 * (i + 1)} * {eta})')}"
        for i in range(4)
    )
    x_terms = " + ".join(
        f"{_r(a[i])} * cos({2 * (i + 1)} * {xi}) * {sinh_s(f'({2 * (i + 1)} * {eta})')}"
        for i in range(4)
    )
    return f"({eta} + {x_terms})", f"({xi} + {y_terms})"


def utm_fwd_sql(lon: str = "lon", lat: str = "lat") -> tuple[str, str, str]:
    """(zone, easting, northing) SQL for WGS-84 UTM with AUTOMATIC zone
    selection — the practical batch form of the reference's Transverse
    Mercator (fixed lon0 there; here each row projects against its own
    zone's central meridian, so |λ−λ0| ≤ 3° and the Krüger order-4 series
    is at full accuracy everywhere).

    zone = floor((lon+180)/6) mod 60 + 1; central meridian = 6·zone − 183;
    k0 = 0.9996, false easting 500 km, false northing 10 000 km in the
    southern hemisphere.  Pure common-dialect SQL: the engine wraps the
    same text in ``F.expr`` (JVM codegen), the oracle runs it in DuckDB.
    """
    from .core.spheroid import Spheroid

    params = ProjectionParams(spheroid=Spheroid.WGS_84, scale=0.9996)
    C = _MODULES["transverse_mercator"].prepare(params)
    sc = _r(C["scale"])  # k0 · a · Krüger-A
    zone = f"(CAST(floor(({lon} + 180.0) / 6.0) AS BIGINT) % 60 + 1)"
    cm = f"(CAST({zone} AS DOUBLE) * 6.0 - 183.0)"
    lam = f"(radians({lon}) - radians({cm}))"
    phi = f"radians({lat})"
    xb, yb = _tmerc_e_body_sql(lam, phi, C)
    x = f"(500000.0 + {sc} * {xb})"
    y = f"((CASE WHEN {lat} >= 0.0 THEN 0.0 ELSE 10000000.0 END) + {sc} * {yb})"
    return zone, x, y


def utm_stages(lon: str = "lon", lat: str = "lat") -> list[dict[str, str]]:
    """``utm_fwd_sql`` as STAGED fragments — same math, each intermediate
    (λ, τ, σ, τ′, ξ, η) computed ONCE as a named column instead of being
    re-inlined combinatorially into one expression tree (the flat form
    measured ~3.6× slower through codegen than the fixed-meridian tmerc;
    staging restores the expected per-row cost, and the DuckDB twin
    chains the same fragments as CTEs).

    Returns a list of stages; each stage is a dict of new column name →
    SQL text over the previous stages' columns (plus ``lon``/``lat``).
    The final stage defines ``zone``, ``utm_x``, ``utm_y``.
    """
    from .core.spheroid import Spheroid

    params = ProjectionParams(spheroid=Spheroid.WGS_84, scale=0.9996)
    C = _MODULES["transverse_mercator"].prepare(params)
    sc = _r(C["scale"])
    e = _r(C["ecc"])
    a = C["alpha"]
    zone = f"(CAST(floor(({lon} + 180.0) / 6.0) AS BIGINT) % 60 + 1)"
    stages: list[dict[str, str]] = [
        {"_zn": zone,
         "_phi": f"radians({lat})"},
        {"_lam": f"(radians({lon}) - radians(CAST(_zn AS DOUBLE) * 6.0 - 183.0))",
         "_tau": "tan(_phi)"},
        {"_sig": sinh_s(f"({e} * {atanh_s(f'({e} * _tau / sqrt(1.0 + _tau * _tau))')})")},
        {"_tau1": "(_tau * sqrt(1.0 + _sig * _sig) - _sig * sqrt(1.0 + _tau * _tau))"},
        {"_xi": "atan2(_tau1, cos(_lam))",
         "_eta": asinh_s("(sin(_lam) / sqrt(_tau1 * _tau1 + cos(_lam) * cos(_lam)))")},
        {"zone": "_zn",
         "utm_x": "(500000.0 + " + sc + " * (_eta + " + " + ".join(
             f"{_r(a[i])} * cos({2 * (i + 1)} * _xi) * {sinh_s(f'({2 * (i + 1)} * _eta)')}"
             for i in range(4)) + "))",
         "utm_y": (f"((CASE WHEN {lat} >= 0.0 THEN 0.0 ELSE 10000000.0 END) + "
                   + sc + " * (_xi + " + " + ".join(
                       f"{_r(a[i])} * sin({2 * (i + 1)} * _xi) * {cosh_s(f'({2 * (i + 1)} * _eta)')}"
                       for i in range(4)) + "))")},
    ]
    return stages


def utm_stages_cte(table_sql: str, keys: tuple[str, ...],
                   lon: str = "lon", lat: str = "lat",
                   extra: tuple[str, ...] = ()) -> str:
    """Chain ``utm_stages`` as DuckDB CTEs over ``table_sql`` (which must
    expose ``keys`` + lon/lat): SELECT keys [, extra], zone, utm_x, utm_y
    (``extra`` passes source columns through — e.g. ``lat`` for the MGRS
    band stage)."""
    stages = utm_stages(lon, lat)
    ks = ", ".join(keys + extra)
    sql = f"WITH s0 AS ({table_sql})"
    prev = "s0"
    for i, st in enumerate(stages, 1):
        cols = ", ".join(f"{txt} AS {name}" for name, txt in st.items())
        sql += f",\ns{i} AS (SELECT *, {cols} FROM {prev})"
        prev = f"s{i}"
    return sql + f"\nSELECT {ks}, zone, utm_x, utm_y FROM {prev}"


def fwd_xy_sql(proj: str, params: ProjectionParams,
               lon: str = "lon", lat: str = "lat",
               dialect: str = "duck") -> tuple[str, str]:
    """(x_sql, y_sql) for the projection's FORWARD map.

    Transliterates the numpy ``forward`` of each projection module with the
    constants from its ``prepare`` folded in as literals.  ``dialect="duck"``
    feeds the correctness oracles; ``dialect="spark"`` is the engine's
    JVM-codegen fast path (``functions.project_fwd_cols`` wraps it in
    ``F.expr``) — every forward is closed-form, so it never needs Python.
    The only dialect divergence is array-literal indexing (Robinson's
    coefficient tables); the trig/ln math is common SQL.
    """
    proj, params = resolve(proj, params)
    C = _MODULES[proj].prepare(params)
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    phi = f"radians({lat})"

    if proj == "mercator":
        if C["spherical"]:
            ys = asinh_s(f"tan({phi})")
        else:
            e = _r(C["ecc"])
            ys = f"({asinh_s(f'tan({phi})')} - {e} * {atanh_s(f'({e} * sin({phi}))')})"
        return f"({x0} + {sc} * radians({lon}))", f"({y0} + {sc} * {ys})"

    lam = f"(radians({lon}) - {_r(C.get('lambda0', 0.0))})"

    if proj in ("albers_equal_area", "lambert_conformal_conic"):
        n, c, rho0 = _r(C["n"]), _r(C["c"]), _r(C["rho0"])
        if proj == "albers_equal_area":
            if C["spherical"]:
                rho = f"sqrt({c} - 2.0 * {n} * sin({phi}))"
            else:
                rho = f"sqrt({c} - {n} * {_qsfn_s(f'sin({phi})', C['ecc'], C['one_ecc2'])})"
        else:
            if C["spherical"]:
                rho = f"({c} * exp(-({n}) * {asinh_s(f'tan({phi})')}))"
            else:
                e = _r(C["ecc"])
                rho = (f"({c} * exp(-({n}) * ({asinh_s(f'tan({phi})')}"
                       f" - {e} * {atanh_s(f'({e} * sin({phi}))')})))")
        x = f"({x0} + {sc} * {rho} * sin({lam} * {n}))"
        y = f"({y0} + {sc} * ({rho0} - {rho} * cos({lam} * {n})))"
        return x, y

    if proj == "lambert_azimuthal_equal_area":
        if C["spherical"]:
            s0, c0 = _r(C["sinPhi0"]), _r(C["cosPhi0"])
            b = f"sqrt(2.0 / (1.0 + {s0} * sin({phi}) + {c0} * cos({phi}) * cos({lam})))"
            x = f"({x0} + {sc} * {b} * cos({phi}) * sin({lam}))"
            y = f"({y0} + {sc} * {b} * ({c0} * sin({phi}) - {s0} * cos({phi}) * cos({lam})))"
        else:
            sinB = f"({_qsfn_s(f'sin({phi})', C['ecc'], C['one_ecc2'])} / {_r(C['qp'])})"
            cosB = f"sqrt(1.0 - {sinB} * {sinB})"
            s1, c1 = _r(C["sinB1"]), _r(C["cosB1"])
            b = f"sqrt(2.0 / (1.0 + {s1} * {sinB} + {c1} * {cosB} * cos({lam})))"
            x = f"({x0} + {sc} * {_r(C['xmf'])} * {b} * {cosB} * sin({lam}))"
            y = f"({y0} + {sc} * {_r(C['ymf'])} * {b} * ({c1} * {sinB} - {s1} * {cosB} * cos({lam})))"
        return x, y

    if proj == "american_polyconic":
        en = C["en"]
        sp, cp = f"sin({phi})", f"cos({phi})"
        E = f"({lam} * {sp})"
        if C["spherical"]:
            cot = f"({cp} / {sp})"
            x_g = f"({cot} * sin({E}))"
            y_g = f"({phi} - {_r(C['phi0'])} + {cot} * sin({E}) * tan(0.5 * {E}))"
            x_eq, y_eq = lam, _r(-C["phi0"])
        else:
            es = C["ecc2"]
            ml = (f"({_r(en[0])} * {phi} - {cp} * {sp} * ({_r(en[1])} + {sp} * {sp} * ({_r(en[2])}"
                  f" + {sp} * {sp} * ({_r(en[3])} + {sp} * {sp} * {_r(en[4])}))))")
            ms = f"({cp} / ({sp} * sqrt(1.0 - {_r(es)} * {sp} * {sp})))"
            x_g = f"({ms} * sin({E}))"
            y_g = f"(({ml} - {_r(C['ml0'])}) + {ms} * sin({E}) * tan(0.5 * {E}))"
            x_eq = f"({lam} * {cp} / sqrt(1.0 - {_r(es)} * {sp} * {sp}))"
            y_eq = f"({ml} - {_r(C['ml0'])})"
        # SAME branch epsilon as the numpy forward (proj/polyconic._EQ_EPS)
        # or the codegen/oracle path and the pandas-UDF path diverge for
        # near-equatorial latitudes
        from .proj import polyconic as _poly

        eq = f"(abs({sp}) < {_r(_poly._EQ_EPS)})"
        x = f"({x0} + {sc} * (CASE WHEN {eq} THEN {x_eq} ELSE {x_g} END))"
        y = f"({y0} + {sc} * (CASE WHEN {eq} THEN {y_eq} ELSE {y_g} END))"
        return x, y

    if proj == "oblique_stereographic":
        c0 = _r(C["c0"])
        lam_c = f"({c0} * {lam})"
        if C["spherical"]:
            phic = phi
        else:
            e = _r(C["ecc"])
            iso = asinh_s(f"tan({phi})")
            corr = atanh_s(f"({e} * sin({phi}))")
            arg = f"({_r(C['log_k0'])} + {c0} * ({iso} - {e} * {corr}))"
            phic = f"atan({sinh_s(arg)})"
        s0, cc0 = _r(C["sinPhiC0"]), _r(C["cosPhiC0"])
        k = f"({sc} / (1.0 + {s0} * sin({phic}) + {cc0} * cos({phic}) * cos({lam_c})))"
        x = f"({x0} + {k} * cos({phic}) * sin({lam_c}))"
        y = f"({y0} + {k} * ({cc0} * sin({phic}) - {s0} * cos({phic}) * cos({lam_c})))"
        return x, y

    if proj == "transverse_mercator":
        if C["spherical"]:
            tau = f"tan({phi})"
            hyp = f"sqrt({tau} * {tau} + cos({lam}) * cos({lam}))"
            y = f"({y0} + {sc} * atan2({tau}, cos({lam})))"
            x = f"({x0} + {sc} * {asinh_s(f'(sin({lam}) / {hyp})')})"
            return x, y
        xb, yb = _tmerc_e_body_sql(lam, phi, C)
        return f"({x0} + {sc} * {xb})", f"({y0} + {sc} * {yb})"

    if proj == "robinson":
        dphi = f"abs(radians({lat}))"
        idx = f"least(CAST(floor({dphi} * {_r(ROB_C1)}) AS BIGINT), {NODES - 1})"
        z = f"degrees({dphi} - {_r(ROB_RC1)} * {idx})"

        def table_list(tbl, col):
            vals = ", ".join(_r(v) for v in tbl[:, col])
            return (f"array({vals})" if dialect == "spark" else f"list_value({vals})")

        def elem(lst):
            return (f"element_at({lst}, CAST({idx} AS INT) + 1)" if dialect == "spark"
                    else f"({lst}[{idx} + 1])")

        def v_poly(tbl):
            c0, c1, c2, c3 = (elem(table_list(tbl, c)) for c in range(4))
            return f"({c0} + {z} * ({c1} + {z} * ({c2} + {z} * {c3})))"

        x = f"({x0} + {sc} * {v_poly(ROB_X)} * {_r(FXC)} * radians({lon}))"
        y = (f"({y0} + {sc} * (CASE WHEN radians({lat}) >= 0 THEN 1.0 ELSE -1.0 END)"
             f" * {v_poly(ROB_Y)} * {_r(FYC)})")
        return x, y

    if proj == "winkel_tripel":
        lam2 = f"(0.5 * {lam})"
        cos_d = f"(cos({phi}) * cos({lam2}))"
        d = f"acos(least(greatest({cos_d}, -1.0), 1.0))"
        sin_d = f"sqrt(greatest(1.0 - {cos_d} * {cos_d}, 0.0))"
        dos = (f"(CASE WHEN {d} = 0.0 THEN 1.0 ELSE {d} /"
               f" (CASE WHEN {sin_d} = 0.0 THEN 1.0 ELSE {sin_d} END) END)")
        x = f"({x0} + {sc} * ({lam2} * {_r(C['cosphi1'])} + {dos} * cos({phi}) * sin({lam2})))"
        y = f"({y0} + {sc} * 0.5 * ({phi} + {dos} * sin({phi})))"
        return x, y

    raise KeyError(f"no SQL oracle for projection {proj!r}")


# ------------------------------------------------------ Vincenty inverse ----


def vincenty_inverse_sql(base: str, keys: str, iters: int = 6,
                         a: float = 6378137.0,
                         f: float = 1.0 / 298.257223563) -> str:
    """Vincenty-1975 inverse as a fixed-unroll staged-CTE SQL transliteration.

    ``base`` is a CTE/table with columns ``{keys}, lon1, lat1, lon2, lat2``
    (degrees); the returned fragment is a comma-joined CTE chain whose last
    CTE ``vfin`` exposes ``{keys}, dist_m``.  The engine's numpy core
    (``geo/geodesic.py:vincenty_inverse``) iterates the same lambda
    recursion to 1e-12 with an early-exit mask; this oracle unrolls a fixed
    ``iters`` steps instead — the test envelope (lon ±60, lat −40..80) is
    provably non-antipodal (max central angle ≈134°) and converges in ≤5
    steps, and post-convergence drift is <1e-12 rad/step, far below the
    query's 10 m quantization.  Same fixed-unroll-to-SQL discipline as the
    Krüger forward (reference semantics: kernel/pl_geodesic.opencl:124-209,
    the disabled ``*_e`` kernels)."""
    b = a * (1.0 - f)
    ff = _r(f)
    bc = f"{keys}, L, su1, cu1, su2, cu2"
    ctes = [
        (f"v0 AS (SELECT {keys}, radians(lon2) - radians(lon1) AS L, "
         f"atan((1.0 - {ff}) * tan(radians(lat1))) AS U1, "
         f"atan((1.0 - {ff}) * tan(radians(lat2))) AS U2 FROM {base})"),
        (f"v1 AS (SELECT {keys}, L, sin(U1) AS su1, cos(U1) AS cu1, "
         f"sin(U2) AS su2, cos(U2) AS cu2, L AS lam FROM v0)"),
    ]
    prev = "v1"

    def sigma_stages(p: str, src: str) -> list[str]:
        return [
            (f"{p}a AS (SELECT {bc}, lam, sin(lam) AS sl, cos(lam) AS cl "
             f"FROM {src})"),
            (f"{p}b AS (SELECT {bc}, lam, sl, cl, "
             f"sqrt((cu2*sl)*(cu2*sl) + (cu1*su2 - su1*cu2*cl)*(cu1*su2 - su1*cu2*cl)) AS ss, "
             f"su1*su2 + cu1*cu2*cl AS cs FROM {p}a)"),
            (f"{p}c AS (SELECT {bc}, lam, sl, ss, cs, atan2(ss, cs) AS sig, "
             f"CASE WHEN ss = 0.0 THEN 0.0 ELSE cu1*cu2*sl/ss END AS sa FROM {p}b)"),
            (f"{p}d AS (SELECT {bc}, lam, ss, cs, sig, sa, 1.0 - sa*sa AS c2a FROM {p}c)"),
            (f"{p}e AS (SELECT {bc}, lam, ss, cs, sig, sa, c2a, "
             f"CASE WHEN c2a = 0.0 THEN 0.0 ELSE cs - 2.0*su1*su2/c2a END AS c2m, "
             f"{ff}/16.0*c2a*(4.0 + {ff}*(4.0 - 3.0*c2a)) AS cc FROM {p}d)"),
        ]

    for k in range(iters):
        p = f"vi{k}"
        ctes += sigma_stages(p, prev)
        ctes.append(
            f"{p} AS (SELECT {bc}, "
            f"L + (1.0-cc)*{ff}*sa*(sig + cc*ss*(c2m + cc*cs*(-1.0 + 2.0*c2m*c2m))) AS lam "
            f"FROM {p}e)")
        prev = p

    ctes += sigma_stages("vf", prev)
    u2_scale = _r((a * a - b * b) / (b * b))
    ctes += [
        (f"vfu AS (SELECT {keys}, sig, ss, cs, c2m, c2a * {u2_scale} AS u2 FROM vfe)"),
        (f"vfab AS (SELECT {keys}, sig, ss, cs, c2m, "
         f"1.0 + u2/16384.0*(4096.0 + u2*(-768.0 + u2*(320.0 - 175.0*u2))) AS aa, "
         f"u2/1024.0*(256.0 + u2*(-128.0 + u2*(74.0 - 47.0*u2))) AS bb FROM vfu)"),
        (f"vfin AS (SELECT {keys}, {_r(b)} * aa * (sig - (bb*ss*(c2m + bb/4.0*("
         f"cs*(-1.0 + 2.0*c2m*c2m) - bb/6.0*c2m*(-3.0 + 4.0*ss*ss)*(-3.0 + 4.0*c2m*c2m)"
         f")))) AS dist_m FROM vfab)"),
    ]
    return ", ".join(ctes)


# --------------------------------------------------- closed-form inverses ---


def inv_lonlat_sql(proj: str, params: "ProjectionParams",
                   x: str = "x", y: str = "y") -> tuple[str, str]:
    """(lon_sql, lat_sql) for the CLOSED-FORM spherical inverse maps.

    Only the spherical Mercator and spherical LAEA inverses are
    non-iterative (reference kernels: pl_project_mercator.opencl reverse
    branch, pl_project_lambert_azimuthal_equal_area.opencl reverse
    spherical branch); the others are validated by the arcsec round-trip
    closure query instead.  No longitude re-wrap is emitted: the test
    envelope (lon ±60°, |lon0| ≤ 20°) never crosses ±180°.
    """
    proj, params = resolve(proj, params)
    C = _MODULES[proj].prepare(params)
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    xs = f"(({x} - {x0}) / {sc})"
    ys = f"(({y} - {y0}) / {sc})"

    # NOTE: no nested fixed-point unrolls here — sinh_s/atanh_s duplicate
    # their argument, so nesting grows ~4^rounds (a 6-round phi2 nest
    # measured 4.7 MB of SQL / 84 s of DuckDB planning).  Iterative
    # inverses use the staged-CTE generators below instead
    # (phi2_inverse_sql & friends): linear size, <0.1 s.
    if proj == "mercator" and C["spherical"]:
        return f"degrees({xs})", f"degrees(atan({sinh_s(ys)}))"

    if proj == "lambert_azimuthal_equal_area" and C["spherical"]:
        s0, c0 = _r(C["sinPhi0"]), _r(C["cosPhi0"])
        lam0 = _r(C["lambda0"])
        rho2 = f"({xs}*{xs} + {ys}*{ys})"
        cosc = f"(1.0 - 0.5 * {rho2})"
        sinc = f"sqrt(greatest(1.0 - 0.25 * {rho2}, 0.0))"
        lat = (f"degrees(asin(least(greatest({cosc} * {s0} + {ys} * {sinc} * {c0},"
               f" -1.0), 1.0)))")
        lon = f"degrees(atan2({xs} * {sinc}, {c0} * {cosc} - {ys} * {s0} * {sinc}) + {lam0})"
        return lon, lat

    if proj == "lambert_azimuthal_equal_area" and not C["spherical"]:
        # ellipsoidal: closed form + authalic latitude series (apa)
        lam0 = _r(C["lambda0"])
        s1, c1, rq, dd = _r(C["sinB1"]), _r(C["cosB1"]), _r(C["rq"]), _r(C["dd"])
        xd = f"({xs} / {dd})"
        yd = f"({ys} * {dd})"
        rho2 = f"(({xd}*{xd} + {yd}*{yd}) / ({rq}*{rq}))"
        cosce = f"(1.0 - 0.5 * {rho2})"
        since = f"(sqrt(greatest(1.0 - 0.25 * {rho2}, 0.0)) / {rq})"
        beta = (f"asin(least(greatest({cosce} * {s1} + {yd} * {since} * {c1},"
                f" -1.0), 1.0))")
        apa = C["apa"]
        lat = (f"degrees({beta} + {_r(apa[0])} * sin(2.0*{beta})"
               f" + {_r(apa[1])} * sin(4.0*{beta})"
               f" + {_r(apa[2])} * sin(6.0*{beta}))")
        lon = (f"degrees(atan2({xd} * {since}, {c1} * {cosce}"
               f" - {yd} * {s1} * {since}) + {lam0})")
        return lon, lat

    if proj == "albers_equal_area" and C["spherical"]:
        n, c = _r(C["n"]), _r(C["c"])
        lam0 = _r(C.get("lambda0", 0.0))
        ysr = f"({_r(C['rho0'])} - {ys})"
        qs = f"(({c} - ({xs}*{xs} + {ysr}*{ysr})) / {n})"
        lat = f"degrees(asin(least(greatest(0.5 * {qs}, -1.0), 1.0)))"
        lon = f"degrees(atan2({xs}, {ysr}) / {n} + {lam0})"
        return lon, lat

    if proj == "lambert_conformal_conic" and C["spherical"]:
        n, c = C["n"], C["c"]
        lam0 = _r(C.get("lambda0", 0.0))
        sgn = 1.0 if n >= 0 else -1.0
        ysr = f"({_r(C['rho0'])} - {ys})"
        rho = f"({_r(sgn)} * sqrt({xs}*{xs} + {ysr}*{ysr}))"
        log_ts = f"(ln({rho} / {_r(c)}) / {_r(n)})"
        lat = f"degrees(-atan({sinh_s(log_ts)}))"
        lon = f"degrees(atan2({xs} * {_r(sgn)}, {ysr} * {_r(sgn)}) / {_r(n)} + {lam0})"
        return lon, lat

    if proj == "transverse_mercator" and C["spherical"]:
        lam0 = _r(C.get("lambda0", 0.0))
        shx = sinh_s(xs)
        lon = f"degrees(atan2({shx}, cos({ys})) + {lam0})"
        lat = f"degrees(atan2(sin({ys}), sqrt({shx}*{shx} + cos({ys})*cos({ys}))))"
        return lon, lat

    raise KeyError(f"no closed-form inverse SQL for {proj!r} (iterative)")


def vincenty_direct_sql(base: str, keys: str, dist_m: float, iters: int = 5,
                        a: float = 6378137.0,
                        f: float = 1.0 / 298.257223563) -> str:
    """Vincenty-1975 DIRECT problem as a fixed-unroll staged-CTE chain.

    ``base`` has ``{keys}, lon, lat, az`` (degrees); the last CTE ``wfin``
    exposes ``{keys}, lon2, lat2`` (degrees).  The sigma fixed-point
    iteration contracts by ~B (≈2e-3 on WGS84) per step, so ``iters=5``
    is <1e-12 rad for any sub-1000-km distance; the engine's numpy core
    (``geo/geodesic.py:vincenty_direct``) iterates the same recursion to
    1e-12.  No longitude re-wrap (envelope-safe).  Reference semantics:
    the disabled forward kernel, kernel/pl_geodesic.opencl:124-208."""
    b = a * (1.0 - f)
    ff = _r(f)
    s = _r(dist_m)
    bc = f"{keys}, lam1, su1, cu1, sa1, ca1, sal, c2a, sig1, bb, sgb"
    ctes = [
        (f"w0 AS (SELECT {keys}, radians(lon) AS lam1, radians(az) AS al1, "
         f"(1.0 - {ff}) * tan(radians(lat)) AS tu1 FROM {base})"),
        (f"w1 AS (SELECT {keys}, lam1, sin(al1) AS sa1, cos(al1) AS ca1, tu1, "
         f"1.0 / sqrt(1.0 + tu1*tu1) AS cu1 FROM w0)"),
        (f"w2 AS (SELECT {keys}, lam1, sa1, ca1, cu1, tu1 * cu1 AS su1, "
         f"atan2(tu1, ca1) AS sig1, cu1 * sa1 AS sal FROM w1)"),
        (f"w3 AS (SELECT {keys}, lam1, sa1, ca1, cu1, su1, sig1, sal, "
         f"(1.0 - sal*sal) AS c2a FROM w2)"),
        (f"w4 AS (SELECT {keys}, lam1, sa1, ca1, cu1, su1, sig1, sal, c2a, "
         f"c2a * {_r((a * a - b * b) / (b * b))} AS u2 FROM w3)"),
        (f"w5 AS (SELECT {keys}, lam1, sa1, ca1, cu1, su1, sig1, sal, c2a, "
         f"1.0 + u2/16384.0*(4096.0 + u2*(-768.0 + u2*(320.0 - 175.0*u2))) AS aa, "
         f"u2/1024.0*(256.0 + u2*(-128.0 + u2*(74.0 - 47.0*u2))) AS bb FROM w4)"),
        (f"w6 AS (SELECT {bc.replace(', sgb', '')}, "
         f"{s} / ({_r(b)} * aa) AS sgb FROM w5)"),
        (f"w7 AS (SELECT {bc}, sgb AS sig FROM w6)"),
    ]
    prev = "w7"
    for k in range(iters):
        p = f"wi{k}"
        ctes += [
            (f"{p}a AS (SELECT {bc}, sig, cos(2.0*sig1 + sig) AS c2m, "
             f"sin(sig) AS ss, cos(sig) AS cs FROM {prev})"),
            (f"{p} AS (SELECT {bc}, sgb + bb*ss*(c2m + bb/4.0*("
             f"cs*(-1.0 + 2.0*c2m*c2m) - bb/6.0*c2m*(-3.0 + 4.0*ss*ss)"
             f"*(-3.0 + 4.0*c2m*c2m))) AS sig FROM {p}a)"),
        ]
        prev = p
    ctes += [
        (f"wfa AS (SELECT {bc}, sig, sin(sig) AS ss, cos(sig) AS cs, "
         f"cos(2.0*sig1 + sig) AS c2m FROM {prev})"),
        (f"wfb AS (SELECT {bc}, sig, ss, cs, c2m, "
         f"su1*ss - cu1*cs*ca1 AS tmp, "
         f"{ff}/16.0*c2a*(4.0 + {ff}*(4.0 - 3.0*c2a)) AS cc FROM wfa)"),
        (f"wfc AS (SELECT {bc}, sig, ss, cs, c2m, cc, "
         f"atan2(su1*cs + cu1*ss*ca1, (1.0 - {ff}) * sqrt(sal*sal + tmp*tmp)) AS phi2, "
         f"atan2(ss*sa1, cu1*cs - su1*ss*ca1) AS lam FROM wfb)"),
        (f"wfin AS (SELECT {keys}, "
         f"degrees(lam1 + lam - (1.0-cc)*{ff}*sal*(sig + cc*ss*(c2m + "
         f"cc*cs*(-1.0 + 2.0*c2m*c2m)))) AS lon2, degrees(phi2) AS lat2 FROM wfc)"),
    ]
    return ", ".join(ctes)


def tmerc_e_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """Krüger ellipsoidal Transverse-Mercator INVERSE as staged CTEs.

    Transliterates ``proj/transverse_mercator.py:inverse`` (ellipsoidal
    branch): angle-ladder sin/cos (2ξ′..8ξ′) and sinh/cosh (2η′..8η′),
    the β-series to (ξ, η), then Karney's tau recovery with its single
    fixed Newton step (eq. 19-21) — everything closed-form, so the chain
    ends in CTE ``pfin`` with ``{keys}, ilon, ilat`` (degrees).  ``base``
    must expose ``{keys}, x, y``."""
    proj, p = resolve("transverse_mercator", params)
    C = _MODULES[proj].prepare(p)
    assert not C["spherical"]
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    b = [_r(v) for v in C["beta"]]
    e, one_es = _r(C["ecc"]), _r(C["one_ecc2"])
    lam0 = _r(C.get("lambda0", 0.0))
    k = keys
    _ath = atanh_s(f"({e} * tau0 / sqrt(1.0 + tau0*tau0))")
    sigma_expr = sinh_s(f"({e} * {_ath})")
    sh = sinh_s("(2.0*xs)")
    ch = cosh_s("(2.0*xs)")
    ctes = [
        (f"t0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
        (f"t1 AS (SELECT {k}, xs, ys, sin(2.0*ys) AS s2, cos(2.0*ys) AS c2, "
         f"{sh} AS sh2, {ch} AS ch2 FROM t0)"),
        (f"t2 AS (SELECT {k}, xs, ys, s2, c2, sh2, ch2, "
         f"2.0*s2*c2 AS s4, 2.0*c2*c2 - 1.0 AS c4, "
         f"2.0*sh2*ch2 AS sh4, 2.0*ch2*ch2 - 1.0 AS ch4 FROM t1)"),
        (f"t3 AS (SELECT {k}, xs, ys, s2, c2, sh2, ch2, s4, c4, sh4, ch4, "
         f"s4*c2 + c4*s2 AS s6, c4*c2 - s4*s2 AS c6, "
         f"sh4*ch2 + ch4*sh2 AS sh6, ch4*ch2 + sh4*sh2 AS ch6, "
         f"2.0*s4*c4 AS s8, 2.0*c4*c4 - 1.0 AS c8, "
         f"2.0*sh4*ch4 AS sh8, 2.0*ch4*ch4 - 1.0 AS ch8 FROM t2)"),
        (f"t4 AS (SELECT {k}, "
         f"ys - ({b[0]}*s2*ch2 + {b[1]}*s4*ch4 + {b[2]}*s6*ch6 + {b[3]}*s8*ch8) AS xi, "
         f"xs - ({b[0]}*c2*sh2 + {b[1]}*c4*sh4 + {b[2]}*c6*sh6 + {b[3]}*c8*sh8) AS eta "
         f"FROM t3)"),
        (f"t5 AS (SELECT {k}, {sinh_s('eta')} AS she, sin(xi) AS sxi, cos(xi) AS cxi FROM t4)"),
        (f"t6 AS (SELECT {k}, she, cxi, sxi / sqrt(she*she + cxi*cxi) AS tau0 FROM t5)"),
        (f"t7 AS (SELECT {k}, she, cxi, tau0, "
         f"{sigma_expr} AS sigma FROM t6)"),
        (f"t8 AS (SELECT {k}, she, cxi, tau0, "
         f"tau0 * sqrt(1.0 + sigma*sigma) - sigma * sqrt(1.0 + tau0*tau0) AS taup FROM t7)"),
        (f"t9 AS (SELECT {k}, she, cxi, "
         f"tau0 + (tau0 - taup) / sqrt(1.0 + taup*taup) "
         f"* (1.0 + {one_es}*tau0*tau0) / ({one_es} * sqrt(1.0 + tau0*tau0)) AS tau FROM t8)"),
        (f"pfin AS (SELECT {k}, degrees(atan2(she, cxi) + {lam0}) AS ilon, "
         f"degrees(atan(tau)) AS ilat FROM t9)"),
    ]
    return ", ".join(ctes)


def albers_e_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """Ellipsoidal Albers INVERSE as staged CTEs: the authalic-q inverse
    ``_phi1`` (proj/albers.py:72-90) unrolled to its fixed N_ITER=6 Newton
    rounds (its early break fires at |dphi| ≤ 1e-7 with quadratic
    convergence, so the residual difference vs the full unroll is ~1e-14
    rad — far below the 1e-6-degree quantization).  Chain ends in CTE
    ``pfin`` with ``{keys}, ilon, ilat``; ``base`` exposes ``{keys}, x, y``."""
    from .proj import albers

    C = albers.prepare(params)
    assert not C["spherical"]
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    n, c = _r(C["n"]), _r(C["c"])
    e, one_es, ec = _r(C["ecc"]), _r(C["one_ecc2"]), _r(C["ec"])
    lam0 = _r(C["lambda0"])
    k = keys
    ctes = [
        (f"a0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({_r(C['rho0'])} - ({base}.y - {y0}) / {sc}) AS ysr FROM {base})"),
        (f"a1 AS (SELECT {k}, xs, ysr, "
         f"(({c} - (xs*xs + ysr*ysr)) / {n}) AS qs FROM a0)"),
        (f"a2 AS (SELECT {k}, xs, ysr, qs, "
         f"asin(least(greatest(0.5 * qs, -1.0), 1.0)) AS phi FROM a1)"),
    ]
    prev = "a2"
    for i in range(6):  # N_ITER
        p = f"n{i}"
        ctes += [
            (f"{p}a AS (SELECT {k}, xs, ysr, qs, phi, sin(phi) AS sp, "
             f"cos(phi) AS cp FROM {prev})"),
            (f"{p}b AS (SELECT {k}, xs, ysr, qs, phi, sp, "
             f"CASE WHEN abs(cp) < 1e-15 THEN 1e-15 ELSE cp END AS cps, "
             f"(1.0 - ({e} * sp) * ({e} * sp)) AS com FROM {p}a)"),
            (f"{p} AS (SELECT {k}, xs, ysr, qs, "
             f"phi + 0.5 * com * com / cps * "
             f"(qs / {one_es} - sp / com - {atanh_s(f'({e} * sp)')} / {e}) AS phi "
             f"FROM {p}b)"),
        ]
        prev = p
    ctes.append(
        f"pfin AS (SELECT {k}, "
        f"degrees(atan2(xs, ysr) / {n} + {lam0}) AS ilon, "
        f"degrees(CASE WHEN abs({ec} - abs(qs)) <= 1e-7 "
        f"THEN (CASE WHEN qs >= 0 THEN pi()/2 ELSE -pi()/2 END) "
        f"ELSE phi END) AS ilat FROM {prev})")
    return ", ".join(ctes)


def stereo_e_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """Oblique-Stereographic (ellipsoidal) INVERSE as staged CTEs:
    closed-form conformal-sphere inverse, then the conformal→geodetic
    latitude fixed-point ``_phi_sph2ell`` (proj/stereographic.py:76-84)
    unrolled 6 rounds (linear contraction ~e² ⇒ residual ≪ the 1e-6-degree
    quantization).  Ends in CTE ``pfin`` with ``{keys}, ilon, ilat``."""
    from .proj import stereographic

    proj, p = resolve("oblique_stereographic", params)
    C = _MODULES[proj].prepare(p)
    assert not C["spherical"]
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    s0c, c0c = _r(C["sinPhiC0"]), _r(C["cosPhiC0"])
    c0, log_k0 = _r(C["c0"]), _r(C["log_k0"])
    e = _r(C["ecc"])
    lam0 = _r(C["lambda0"])
    k = keys
    ctes = [
        (f"s0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
        (f"s1 AS (SELECT {k}, xs, ys, sqrt(xs*xs + ys*ys) AS rho FROM s0)"),
        (f"s2 AS (SELECT {k}, xs, ys, rho, sin(2.0*atan(rho)) AS sc_, "
         f"cos(2.0*atan(rho)) AS cc_, "
         f"CASE WHEN rho = 0.0 THEN 1.0 ELSE rho END AS srho FROM s1)"),
        (f"s3 AS (SELECT {k}, "
         f"asin(least(greatest(CASE WHEN rho = 0.0 THEN {s0c} "
         f"ELSE cc_ * {s0c} + ys * sc_ * {c0c} / srho END, -1.0), 1.0)) AS phs, "
         f"atan2(xs * sc_, srho * {c0c} * cc_ - ys * {s0c} * sc_) / {c0} AS lam "
         f"FROM s2)"),
        (f"s4 AS (SELECT {k}, lam, phs, "
         f"({asinh_s('tan(phs)')} - {log_k0}) / {c0} AS lognum FROM s3)"),
        (f"s5 AS (SELECT {k}, lam, lognum, phs AS phi FROM s4)"),
    ]
    prev = "s5"
    for i in range(6):  # N_ITER
        p_ = f"e{i}"
        inner = f"(lognum + {e} * {atanh_s(f'({e} * sin(phi))')})"
        ctes.append(
            f"{p_} AS (SELECT {k}, lam, lognum, "
            f"atan({sinh_s(inner)}) AS phi FROM {prev})")
        prev = p_
    ctes.append(
        f"pfin AS (SELECT {k}, degrees(lam + {lam0}) AS ilon, "
        f"degrees(phi) AS ilat FROM {prev})")
    return ", ".join(ctes)


def _mlfn_sql(phi: str, sp: str, cp: str, en) -> str:
    """helpers.mlfn (meridional distance series) as SQL."""
    e0, e1, e2, e3, e4 = (_r(v) for v in en)
    cs = f"({cp} * {sp})"
    s2 = f"({sp} * {sp})"
    return (f"({e0} * {phi} - {cs} * ({e1} + {s2} * ({e2} + {s2} * "
            f"({e3} + {s2} * {e4}))))")


def _mlfn1_sql(sp: str, cp: str, en) -> str:
    """helpers.mlfn1 (d mlfn / d phi) as SQL."""
    e0, e1, e2, e3, e4 = (_r(v) for v in en)
    c2 = f"({cp} * {cp})"
    s2 = f"({sp} * {sp})"
    return (f"({e0} - ({e1} * ({c2} - {s2}) + {s2} * ({e2} * (3*{c2} - {s2})"
            f" + {s2} * ({e3} * (5*{c2} - {s2}) + {s2} * ({e4} * (7*{c2} - {s2}))))))")


def polyconic_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """American-Polyconic INVERSE as staged CTEs: the 2-D Newton of
    ``proj/polyconic.py:inverse`` unrolled to its exact fixed round count
    (N_ITER_S=6 spherical, N_ITER_E=8 ellipsoidal — the numpy loops have no
    early break, so the unroll is the SAME computation).  All guards
    (equatorial-phi nudge, |sinphi| floor) are replicated as CASEs.
    Ends in CTE ``pfin`` with ``{keys}, ilon, ilat``."""
    from .proj import polyconic as M

    C = M.prepare(params)
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    phi0, lam0 = _r(C["phi0"]), _r(C["lambda0"])
    k = keys
    guard_sp = f"(CASE WHEN abs(sp) < {_r(M._EQ_EPS)} THEN {_r(M._EQ_EPS)} ELSE sp END)"
    ctes = [
        (f"p0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
    ]
    if C["spherical"]:
        ctes += [
            (f"p1 AS (SELECT {k}, xs, ys, "
             f"CASE WHEN abs(ys + {phi0}) < 1e-12 THEN 1e-12 "
             f"ELSE ys + {phi0} END AS phi FROM p0)"),
            (f"p2 AS (SELECT {k}, xs, ys, phi, sin(phi) AS sp, cos(phi) AS cp FROM p1)"),
            (f"p3 AS (SELECT {k}, xs, ys, phi, sp, cp, "
             f"asin(least(greatest(xs * sp / cp, -1.0), 1.0)) / {guard_sp} AS lam FROM p2)"),
        ]
        prev = "p3"
        for i in range(M.N_ITER_S):
            q = f"pi{i}"
            ctes += [
                (f"{q}a AS (SELECT {k}, xs, ys, phi, sp, cp, lam, "
                 f"sin(lam * sp) AS sls, cos(lam * sp) AS cls, "
                 f"sin(lam * sp) * tan(0.5 * lam * sp) AS cls1 FROM {prev})"),
                (f"{q}b AS (SELECT {k}, xs, ys, phi, sp, cp, lam, "
                 f"lam * cp * cp / sp * cls - sls / (sp * sp) AS d1p, "
                 f"1.0 + lam * cp * cp / sp * sls - cls1 / (sp * sp) AS d2p, "
                 f"cp * cls AS d1l, cp * sls AS d2l, "
                 f"cp * sls / sp - xs AS f1, "
                 f"phi - {phi0} + cp * cls1 / sp - ys AS f2 FROM {q}a)"),
                (f"{q}c AS (SELECT {k}, xs, ys, "
                 f"phi - (f1 * d2l - f2 * d1l) / (d1p * d2l - d2p * d1l) AS phi, "
                 f"lam - (f2 * d1p - f1 * d2p) / (d1p * d2l - d2p * d1l) AS lam FROM {q}b)"),
                (f"{q} AS (SELECT {k}, xs, ys, phi, lam, "
                 f"sin(phi) AS sp, cos(phi) AS cp FROM {q}c)"),
            ]
            prev = q
    else:
        es = _r(C["ecc2"])
        en, ml0 = C["en"], _r(C["ml0"])
        ml_a = _mlfn_sql("phia", "sin(phia)", "cos(phia)", en)
        ml1_a = _mlfn1_sql("sin(phia)", "cos(phia)", en)
        ctes += [
            (f"p1 AS (SELECT {k}, xs, ys, ys + {phi0} AS phia FROM p0)"),
            (f"p2 AS (SELECT {k}, xs, ys, "
             f"phia - ({ml_a} - (ys + {ml0})) / {ml1_a} AS phin FROM p1)"),
            (f"p3 AS (SELECT {k}, xs, ys, "
             f"CASE WHEN abs(phin) < 1e-12 THEN 1e-12 ELSE phin END AS phi FROM p2)"),
            (f"p4 AS (SELECT {k}, xs, ys, phi, sin(phi) AS sp, cos(phi) AS cp FROM p3)"),
            (f"p5 AS (SELECT {k}, xs, ys, phi, sp, cp, "
             f"sqrt(1.0 - {es} * sp * sp) AS mlp FROM p4)"),
            (f"p6 AS (SELECT {k}, xs, ys, phi, sp, cp, mlp, "
             f"asin(least(greatest(xs * sp / cp * mlp, -1.0), 1.0)) / {guard_sp} AS lam FROM p5)"),
        ]
        prev = "p6"
        for i in range(M.N_ITER_E):
            q = f"pi{i}"
            ml = _mlfn_sql("phi", "sp", "cp", en)
            ml1 = _mlfn1_sql("sp", "cp", en)
            ctes += [
                (f"{q}a AS (SELECT {k}, xs, ys, phi, sp, cp, mlp, lam, "
                 f"sin(lam * sp) AS sls, cos(lam * sp) AS cls, "
                 f"sin(0.5 * lam * sp) AS sl2, cos(0.5 * lam * sp) AS cl2 FROM {prev})"),
                (f"{q}b AS (SELECT {k}, xs, ys, phi, sp, cp, mlp, lam, sls, cls, sl2, cl2, "
                 f"sls / (sp / cp) / mlp - xs AS f1, "
                 f"{ml} - {ml0} + xs * sl2 / cl2 - ys AS f2, "
                 f"cp / mlp * cls AS d1l, cp / mlp * sls AS d2l, "
                 f"{es} * (1.0 + cp * cp) / (mlp * (1.0 - {es} * sp * sp)) AS c1, "
                 f"1.0 / (sp * sp * mlp * (1.0 - {es} * sp * sp)) AS c2 FROM {q}a)"),
                (f"{q}c AS (SELECT {k}, xs, ys, phi, lam, f1, f2, d1l, d2l, "
                 f"lam * cp / (sp / cp) / mlp * cls + sls * (c1 - c2) AS d1p, "
                 f"{ml1} + 0.5 * lam * xs * cp / (cl2 * cl2) AS d2p FROM {q}b)"),
                (f"{q}d AS (SELECT {k}, xs, ys, "
                 f"phi - (f1 * d2l - f2 * d1l) / (d1p * d2l - d2p * d1l) AS phi, "
                 f"lam - (f2 * d1p - f1 * d2p) / (d1p * d2l - d2p * d1l) AS lam FROM {q}c)"),
                (f"{q} AS (SELECT {k}, xs, ys, phi, lam, sin(phi) AS sp, cos(phi) AS cp, "
                 f"sqrt(1.0 - {es} * sin(phi) * sin(phi)) AS mlp FROM {q}d)"),
            ]
            prev = q
    ctes.append(
        f"pfin AS (SELECT {k}, degrees(lam + {lam0}) AS ilon, "
        f"degrees(phi) AS ilat FROM {prev})")
    return ", ".join(ctes)


def winkel_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """Winkel-Tripel INVERSE as staged CTEs: exact unroll of the fixed
    4-round 2-D Newton (``proj/winkel.py:51-91``; no early break).  The
    center-point guard (d=0 ⇒ non-finite correction ⇒ 0) maps to
    ``CASE WHEN isfinite(...)`` — DuckDB yields NULL for 0-division, which
    the CASE also sends to 0, matching numpy's where(isfinite).  Ends in
    ``pfin`` with ``{keys}, ilon, ilat``.  (DuckDB-only SQL: the oracle
    side never runs on Spark.)"""
    from .proj import winkel as M

    C = M.prepare(params)
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    c1 = _r(C["cosphi1"])
    lam0 = _r(C["lambda0"])
    k = keys
    ctes = [
        (f"w0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
        (f"w1 AS (SELECT {k}, xs, ys, ys AS phi, sin(ys) AS sp, cos(ys) AS cp FROM w0)"),
        (f"w2 AS (SELECT {k}, xs, ys, phi, sp, cp, "
         f"2.0 * xs / (cp + {c1}) AS lam FROM w1)"),
    ]
    prev = "w2"
    for i in range(M.N_ITER):
        q = f"wk{i}"
        ctes += [
            (f"{q}a AS (SELECT {k}, xs, ys, phi, sp, cp, lam, "
             f"2.0 * sp * cp AS s2p, sin(0.5 * lam) AS sl2, cos(0.5 * lam) AS cl2, "
             f"2.0 * sin(0.5 * lam) * cos(0.5 * lam) AS sl, "
             f"acos(least(greatest(cp * cos(0.5 * lam), -1.0), 1.0)) AS d FROM {prev})"),
            (f"{q}b AS (SELECT {k}, xs, ys, phi, sp, cp, lam, s2p, sl2, cl2, sl, d, "
             f"1.0 / (sin(d) * sin(d)) AS ic, 1.0 / sin(d) AS ic12, "
             f"d / (sin(d) * sin(d)) / sin(d) AS dic32 FROM {q}a)"),
            (f"{q}c AS (SELECT {k}, xs, ys, phi, sp, cp, lam, "
             f"d * cp * sl2 * ic12 + 0.5 * lam * {c1} - xs AS f1, "
             f"0.5 * d * sp * ic12 + 0.5 * phi - ys AS f2, "
             f"0.25 * sl * s2p * ic - dic32 * sp * sl2 AS d1p, "
             f"0.5 * (cp * cp * sl2 * sl2 * ic + dic32 * cp * cl2 * sp * sp + {c1}) AS d1l, "
             f"0.5 * (sp * sp * cl2 * ic + dic32 * sl2 * sl2 * cp + 1.0) AS d2p, "
             f"0.125 * (s2p * sl2 * ic - dic32 * sp * cp * cp * sl) AS d2l FROM {q}b)"),
            (f"{q}d AS (SELECT {k}, xs, ys, phi, lam, "
             f"-(f1 * d2l - f2 * d1l) / (d1p * d2l - d2p * d1l) AS dphi, "
             f"-(f2 * d1p - f1 * d2p) / (d1p * d2l - d2p * d1l) AS dlam FROM {q}c)"),
            (f"{q} AS (SELECT {k}, xs, ys, "
             f"phi + (CASE WHEN isfinite(dphi) THEN dphi ELSE 0.0 END) AS phi, "
             f"lam + (CASE WHEN isfinite(dlam) THEN dlam ELSE 0.0 END) AS lam, "
             f"sin(phi + (CASE WHEN isfinite(dphi) THEN dphi ELSE 0.0 END)) AS sp, "
             f"cos(phi + (CASE WHEN isfinite(dphi) THEN dphi ELSE 0.0 END)) AS cp "
             f"FROM {q}d)"),
        ]
        prev = q
    ctes.append(
        f"pfin AS (SELECT {k}, degrees(lam + {lam0}) AS ilon, "
        f"degrees(phi) AS ilat FROM {prev})")
    return ", ".join(ctes)


def robinson_inverse_sql(base: str, keys: str, params: "ProjectionParams") -> str:
    """Robinson INVERSE as staged CTEs (DuckDB-only oracle SQL): the
    node walk (searchsorted over the strictly-increasing Y-table column)
    becomes a literal CASE-count, per-point cubic coefficients gather via
    1-based list-literal indexing, and the Newton root polish
    (``proj/robinson.py:102-127``) unrolls its full 12 rounds (early break
    at |dt| < 1e-6 deg leaves a residual far below the 1e-6-degree output
    quantum).  Ends in ``pfin`` with ``{keys}, ilon, ilat``."""
    from .proj import robinson as M

    C = M.prepare(params)
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    fxc, fyc = _r(M.FXC), _r(M.FYC)
    n = M.NODES  # 18
    k = keys

    def lst(col, tbl):
        return "[" + ",".join(_r(v) for v in tbl[:, col]) + "]"

    y0l, y1l, y2l, y3l = (lst(c, M._Y) for c in range(4))
    x0l, x1l, x2l, x3l = (lst(c, M._X) for c in range(4))
    count = " + ".join(
        f"(CASE WHEN phin >= {_r(v)} THEN 1 ELSE 0 END)" for v in M._Y[:, 0]
    )
    ctes = [
        (f"r0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
        (f"r1 AS (SELECT {k}, ys, xs / {fxc} AS lamx, abs(ys / {fyc}) AS phin FROM r0)"),
        (f"r2 AS (SELECT {k}, ys, lamx, phin, "
         f"least(greatest(({count}) - 1, 0), {n - 1}) AS idx FROM r1)"),
        (f"r3 AS (SELECT {k}, ys, lamx, phin, idx, "
         f"({y0l})[idx + 1] AS c0r, ({y1l})[idx + 1] AS c1, "
         f"({y2l})[idx + 1] AS c2, ({y3l})[idx + 1] AS c3, "
         f"({y0l})[least(idx + 1, {n}) + 1] AS up, "
         f"({x0l})[idx + 1] AS xc0, ({x1l})[idx + 1] AS xc1, "
         f"({x2l})[idx + 1] AS xc2, ({x3l})[idx + 1] AS xc3 FROM r2)"),
        (f"r4 AS (SELECT {k}, ys, lamx, phin, idx, c0r - phin AS c0, c1, c2, c3, "
         f"xc0, xc1, xc2, xc3, "
         f"5.0 * (phin - c0r) / (CASE WHEN up = c0r THEN 1.0 ELSE up - c0r END) AS t "
         f"FROM r3)"),
    ]
    prev = "r4"
    carry = f"{k}, ys, lamx, phin, idx, c0, c1, c2, c3, xc0, xc1, xc2, xc3"
    dv = "(CASE WHEN abs(c1 + t*(2.0*c2 + t*3.0*c3)) < 1e-18 THEN 1e-18 " \
         "ELSE c1 + t*(2.0*c2 + t*3.0*c3) END)"
    for i in range(12):
        q = f"rn{i}"
        ctes.append(
            f"{q} AS (SELECT {carry}, "
            f"t - (c0 + t*(c1 + t*(c2 + t*c3))) / {dv} AS t FROM {prev})")
        prev = q
    pole_x0 = _r(M._X[n, 0])
    ctes.append(
        f"pfin AS (SELECT {k}, "
        f"degrees(CASE WHEN phin >= 1.0 THEN lamx / {pole_x0} "
        f"ELSE lamx / (xc0 + t*(xc1 + t*(xc2 + t*xc3))) END) AS ilon, "
        f"degrees((CASE WHEN ys >= 0 THEN 1.0 ELSE -1.0 END) * "
        f"(CASE WHEN phin >= 1.0 THEN pi()/2 "
        f"ELSE radians(5.0*idx + t) END)) AS ilat FROM {prev})")
    return ", ".join(ctes)


def phi2_inverse_sql(base: str, keys: str, proj: str,
                     params: "ProjectionParams", iters: int = 6) -> str:
    """Ellipsoidal conformal inverses (Mercator-e, LCC-e) as staged CTEs:
    the ``helpers.phi2`` fixed-point φ ← −atan(sinh(L − e·atanh(e·sinφ)))
    unrolled ``iters`` rounds with each round's intermediate as a COLUMN
    (linear SQL size; the naive nested form measured 4.7 MB / 84 s of
    DuckDB planning).  Contraction ~e² ⇒ 6 rounds ≪ 1e-12 rad.  Ends in
    ``pfin`` with ``{keys}, ilon, ilat``."""
    proj, p = resolve(proj, params)
    C = _MODULES[proj].prepare(p)
    assert not C["spherical"]
    sc, x0, y0 = _r(C["scale"]), _r(C["x0"]), _r(C["y0"])
    e = _r(C["ecc"])
    k = keys
    ctes = [
        (f"f0 AS (SELECT {k}, ({base}.x - {x0}) / {sc} AS xs, "
         f"({base}.y - {y0}) / {sc} AS ys FROM {base})"),
    ]
    if proj == "mercator":
        ctes.append(f"f1 AS (SELECT {k}, degrees(xs) AS ilon, (-ys) AS lts FROM f0)")
    elif proj == "lambert_conformal_conic":
        n, c = C["n"], C["c"]
        sgn = _r(1.0 if n >= 0 else -1.0)
        lam0 = _r(C.get("lambda0", 0.0))
        ctes += [
            (f"f1a AS (SELECT {k}, xs, ({_r(C['rho0'])} - ys) AS ysr FROM f0)"),
            (f"f1 AS (SELECT {k}, "
             f"degrees(atan2(xs * {sgn}, ysr * {sgn}) / {_r(n)} + {lam0}) AS ilon, "
             f"(ln({sgn} * sqrt(xs*xs + ysr*ysr) / {_r(c)}) / {_r(n)}) AS lts "
             f"FROM f1a)"),
        ]
    else:
        raise KeyError(f"phi2_inverse_sql: unsupported projection {proj!r}")
    ctes.append(f"f2 AS (SELECT {k}, ilon, lts, (-atan({sinh_s('lts')})) AS phi FROM f1)")
    prev = "f2"
    for i in range(iters):
        q = f"f2_{i}"
        ctes += [
            (f"{q}a AS (SELECT {k}, ilon, lts, "
             f"(lts - {e} * {atanh_s(f'({e} * sin(phi))')}) AS g FROM {prev})"),
            (f"{q} AS (SELECT {k}, ilon, lts, (-atan({sinh_s('g')})) AS phi FROM {q}a)"),
        ]
        prev = q
    ctes.append(f"pfin AS (SELECT {k}, ilon, degrees(phi) AS ilat FROM {prev})")
    return ", ".join(ctes)


def bearing_deg(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Initial great-circle bearing (degrees, atan2 range (-180, 180])
    from point 1 to point 2 — the forward-azimuth half of the
    reference's geodesic kernels (kernel/pl_geodesic.opencl computes
    distance only; the azimuth is the standard companion formula).
    Dialect-free text: one string feeds Spark codegen AND DuckDB."""
    dl = f"(radians({lon2}) - radians({lon1}))"
    return (
        f"degrees(atan2(sin({dl}) * cos(radians({lat2})), "
        f"cos(radians({lat1})) * sin(radians({lat2})) "
        f"- sin(radians({lat1})) * cos(radians({lat2})) * cos({dl})))"
    )


def rhumb_stages(lon1: str, lat1: str, lon2: str, lat2: str,
                 radius: float = 6370997.0) -> list[dict[str, str]]:
    """Loxodrome (rhumb-line) inverse: distance (m) + constant course
    (deg, [0, 360)) between two points — the navigation companion to the
    great-circle kernels (the reference's geodesics are great-circle
    only, ``kernel/pl_geodesic.opencl``; a rhumb line is what a fixed
    compass heading actually sails).

    Standard Mercator isometric-latitude formulation (Admiralty manual /
    Bowring 1985):

        Δψ = ln tan(π/4 + φ₂/2) − ln tan(π/4 + φ₁/2)
        q  = Δφ/Δψ   (→ cos φ₁ as Δψ → 0: the east-west limit)
        d  = R·√(Δφ² + q²·Δλ²),   θ = atan2(Δλ, Δψ)

    Δλ is wrapped to [−180°, 180°) with floor() — NEVER round(), whose
    half-way tie-break could differ across engines.  Returned as staged
    dicts (Spark applies them via ``withColumns``, the oracle nests them
    as CTEs) so the shared dialect-free text stays readable; ``q`` must
    be staged because it feeds both the distance and nothing else reuses
    Δψ's guard.  Pole-safe for |φ| < 90 (the test envelope is ±80)."""
    pi4 = _r(math.pi / 4.0)
    wrap = (f"(({lon2}) - ({lon1}) "
            f"- 360.0 * floor((({lon2}) - ({lon1}) + 180.0) / 360.0))")
    s1 = {
        "r_dphi": f"(radians({lat2}) - radians({lat1}))",
        "r_dlam": f"radians({wrap})",
        "r_dpsi": (f"(ln(tan({pi4} + radians({lat2}) / 2.0)) "
                   f"- ln(tan({pi4} + radians({lat1}) / 2.0)))"),
        "r_cphi1": f"cos(radians({lat1}))",
    }
    s2 = {
        "r_q": ("(CASE WHEN abs(r_dpsi) > 1e-12 THEN r_dphi / r_dpsi "
                "ELSE r_cphi1 END)"),
    }
    s3 = {
        "rhumb_m": (f"(sqrt(r_dphi * r_dphi + r_q * r_q * r_dlam * r_dlam)"
                    f" * {_r(radius)})"),
        "rhumb_course": "((degrees(atan2(r_dlam, r_dpsi)) + 360.0) % 360.0)",
    }
    return [s1, s2, s3]


def polyline_q5_sql(x: str) -> str:
    """Google-polyline 1e-5° quantization: floor(x·1e5 + 0.5) — the JS
    ``Math.round`` half-up-toward-+inf the format specifies, spelled as
    floor so both engines share one tie-break (engine-native round()
    modes differ; same trick as ``hexbin_stages``)."""
    return f"CAST(floor({x} * 100000.0 + 0.5) AS BIGINT)"


def polyline_zigzag_sql(d: str) -> str:
    """Zigzag step of the Google encoded-polyline algorithm: left-shift
    then invert negatives — spelled in plain integer arithmetic
    (2d / −2d−1), which is exactly ``(d << 1) ^ (d >> 63)`` for 64-bit d
    but needs no dialect-split shift operators."""
    return f"(CASE WHEN {d} < 0 THEN -2 * ({d}) - 1 ELSE 2 * ({d}) END)"


def polyline_chunks_sql(v: str, dialect: str, max_chunks: int = 7) -> str:
    """Base-32 continuation chunks of a zigzagged value ``v`` (a STAGED
    column name — the text references it ~3·max_chunks times, so callers
    must materialize it as a column first): 5-bit groups, low first,
    0x20 continuation bit, +63 printable offset.  7 chunks cover 32 bits
    — any legal WGS-84 delta.  Shift spelling is the only dialect split
    (Spark ``shiftright`` vs DuckDB ``>>``, the ``simhash_sql``
    precedent); chr() and % are shared."""
    def shr(x: str, n: int) -> str:
        if n == 0:
            return x
        return (f"shiftright({x}, {n})" if dialect == "spark"
                else f"({x} >> {n})")

    parts = []
    for i in range(max_chunks):
        rest = shr(v, 5 * (i + 1))
        chunk = f"({shr(v, 5 * i)} % 32)"
        # DuckDB's chr() is INTEGER-only; the cast is shared (values < 127)
        ch = (f"chr(CAST({chunk} + (CASE WHEN {rest} > 0 THEN 95 ELSE 63 END)"
              f" AS INT))")
        if i == 0:
            parts.append(ch)  # a zero delta still emits one chunk ('?')
        else:
            parts.append(f"(CASE WHEN {shr(v, 5 * i)} > 0 THEN {ch} ELSE '' END)")
    return "(" + " || ".join(parts) + ")"


MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"          # 8° latitude bands, no I/O
MGRS_COLS = "ABCDEFGHJKLMNPQRSTUVWXYZ".replace("I", "").replace("O", "")
MGRS_ROWS = "ABCDEFGHJKLMNPQRSTUV"           # 20-row northing cycle, no I/O


def mgrs_stages(zone: str, e: str, n: str, lat: str,
                km_digits: int = 2) -> list[dict[str, str]]:
    """MGRS (military grid reference system) string from UTM auto-zone
    outputs — the interoperable grid ADDRESS on top of the projection the
    reference stops at (``pl_project_transverse_mercator.opencl`` emits
    meters; MGRS is how those meters are exchanged).  Standard MGRS-new
    (AA) lettering scheme:

    - latitude band: 8° bands C..X (I/O skipped), X clamped at 72–84°;
    - 100-km column: 24-letter cycle, offset 8·((zone−1) mod 3) so the
      A/J/S column origins repeat every 3 zones;
    - 100-km row: 20-letter 2 000-km northing cycle, +5 offset (an 'F'
      start) in even zones; southern rows use the false-northing UTM y
      exactly as published;
    - numeric part: ``km_digits`` digits per axis (2 → 1-km precision).

    All letter picks are substr() over literal alphabets and all index
    math is floor/% over BIGINTs — one dialect-free staged text for Spark
    ``withColumns`` codegen AND the DuckDB oracle (DuckDB accepts the
    STRING alias, so even the casts are shared).  Pinned against the
    published CN Tower (17TPJ) and Sydney Opera House (56HLH — even-zone
    row offset, southern hemisphere) vectors in unit tests."""
    q = 10 ** (5 - km_digits)
    s1 = {
        "m_band": (f"substr('{MGRS_BANDS}', CAST(least(floor(({lat} + 80.0)"
                   f" / 8.0), 19.0) AS INT) + 1, 1)"),
        "m_e1": f"CAST(floor({e} / 100000.0) AS BIGINT)",
        "m_n1": f"CAST(floor({n} / 100000.0) AS BIGINT)",
    }
    col_i = f"((({zone}) - 1) % 3 * 8 + (m_e1 - 1)) % 24"
    row_i = (f"((m_n1 % 20) + (CASE WHEN ({zone}) % 2 = 0 THEN 5 ELSE 0 END))"
             f" % 20")
    s2 = {
        "m_sq": (f"(substr('{MGRS_COLS}', CAST({col_i} AS INT) + 1, 1) || "
                 f"substr('{MGRS_ROWS}', CAST({row_i} AS INT) + 1, 1))"),
        "m_ed": (f"lpad(CAST(CAST(floor(({e} - m_e1 * 100000.0) / {q}.0) "
                 f"AS BIGINT) AS STRING), {km_digits}, '0')"),
        "m_nd": (f"lpad(CAST(CAST(floor(({n} - m_n1 * 100000.0) / {q}.0) "
                 f"AS BIGINT) AS STRING), {km_digits}, '0')"),
    }
    s3 = {
        "mgrs": (f"(lpad(CAST({zone} AS STRING), 2, '0') || m_band || m_sq"
                 f" || m_ed || m_nd)"),
    }
    return [s1, s2, s3]


def slippy_global_px(lon: str, lat: str, zoom: int,
                     tile_px: int = 256) -> tuple[str, str]:
    """Global Web-Mercator pixel indices at ``zoom`` — the slippy-map
    (z/x/y) tiling standard every web map serves (tile = gpx // tile_px,
    in-tile pixel = gpx % tile_px).  Engine-added: the reference projects
    Mercator (kernel/pl_project_mercator.opencl) but has no tile
    addressing.  Deriving tile AND pixel from ONE floor() keeps them
    exactly consistent (a point can never land in tile i with a pixel
    that belongs to tile i+1).  Closed-form text shared verbatim by the
    Spark codegen column and the DuckDB oracle; ln/tan/floor evaluate in
    IEEE float64 on both.  gy clamps the poles (|lat| > 85.0511°) into
    the edge rows, per the standard."""
    n = float((1 << zoom) * tile_px)
    gx = (f"CAST(least(greatest(floor({_r(n / 360.0)} * ({lon} + 180.0)),"
          f" 0.0), {_r(n - 1.0)}) AS BIGINT)")
    phi = f"radians({lat})"
    merc = f"(1.0 - ln(tan({phi}) + 1.0 / cos({phi})) / pi())"
    gy = (f"CAST(least(greatest(floor({_r(n / 2.0)} * {merc}),"
          f" 0.0), {_r(n - 1.0)}) AS BIGINT)")
    return gx, gy


def quadkey_sql(tx: str, ty: str, zoom: int) -> str:
    """Bing-maps quadkey string for a slippy tile (``tx``, ``ty``) at
    ``zoom``: digit i (MSB first) = 2·bit_i(ty) + bit_i(tx), so the
    level-k PREFIX of a quadkey IS the ancestor tile at zoom k — the
    string form of the quadtree containment the tile cache keys on.

    Engine-added (the reference stops at projected meters; quadkeys are
    the interoperable tile address for Bing/Azure-style tile stores).
    Dialect-free text: bit extraction is floor-division arithmetic
    (tiles are < 2^zoom, exact in float64) and each digit maps through a
    4-arm CASE to its character, so the same string feeds Spark codegen
    and the DuckDB oracle with no cast-rendering differences."""
    digits = []
    for i in range(zoom - 1, -1, -1):
        p = 1 << i
        d = (f"(CAST(floor({ty} / {p}.0) AS BIGINT) % 2 * 2"
             f" + CAST(floor({tx} / {p}.0) AS BIGINT) % 2)")
        digits.append("(CASE " + " ".join(
            f"WHEN {d} = {v} THEN '{v}'" for v in range(3)) + " ELSE '3' END)")
    return "(" + " || ".join(digits) + ")"


def hexbin_stages(size_deg: float) -> dict[str, str]:
    """Pointy-top hexagonal binning (axial coordinates + cube rounding)
    as staged dialect-free SQL fragments — the hex-density aggregation
    every geo dashboard offers, engine-added (the reference has no
    binning).  Plate-carrée frame: x = lon°, y = lat°, hex size
    ``size_deg`` = center-to-vertex distance in degrees.

    - ``qf``/``rf``: {x}/{y} → fractional axial coords
      (q = (√3/3·x − y/3)/s, r = 2y/3s);
    - ``hq``/``hr``: {qf}/{rf} → the rounded axial cell, via cube
      rounding (round q, r, s=−q−r; re-derive the axis with the largest
      rounding error from the other two, so the cell is always the
      nearest hex center).

    round() is spelled floor(v + 0.5) so both engines share one
    half-up semantic; inputs are md5-derived so exact .5 never occurs.
    """
    s = _r(float(size_deg))
    rt3 = _r(math.sqrt(3.0) / 3.0)
    qf = f"(({rt3} * {{x}} - {{y}} / 3.0) / {s})"
    rf = f"((2.0 / 3.0) * {{y}} / {s})"

    def rnd(v: str) -> str:
        return f"CAST(floor({v} + 0.5) AS BIGINT)"

    yf = "(-({qf}) - ({rf}))"
    rx, ry, rz = rnd("{qf}"), rnd(yf), rnd("{rf}")
    dx = f"abs({rx} - ({{qf}}))"
    dy = f"abs({ry} - {yf})"
    dz = f"abs({rz} - ({{rf}}))"
    hq = (f"(CASE WHEN {dx} > {dy} AND {dx} > {dz}"
          f" THEN -({ry}) - ({rz}) ELSE {rx} END)")
    hr = (f"(CASE WHEN NOT ({dx} > {dy} AND {dx} > {dz})"
          f" AND NOT ({dy} > {dz}) THEN -({rx}) - ({ry}) ELSE {rz} END)")
    return {"qf": qf, "rf": rf, "hq": hq, "hr": hr}


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_stages(precision: int = 5) -> dict[str, str]:
    """Classic base32 geohash as staged dialect-free SQL fragments.

    Engine-added (the reference has no string cell addressing; geohash is
    the interoperable key format for exporting the cell index to external
    systems).  Format-string fragments, staged so the md5-derived lon/lat
    are evaluated ONCE per row in a CTE and the per-bit terms reference
    plain columns:

    - ``lonv``/``latv``: {lon}/{lat} → integer bin (18/17 bits at p=7);
    - ``morton``: {lonv}/{latv} → the interleaved 5p-bit Morton code
      (lon bit k at position 2k, lat bit k at 2k+1 — lon leads, per the
      geohash spec) — exact BIGINT term-sum at any precision;
    - ``gh``: {lonv}/{latv} → the base32 string, one substr per
      character, each 5-bit value assembled bit-by-bit straight from the
      bin integers.  (NOT derived from the morton column: dividing a
      5p-bit BIGINT by 2^k routes through float64 and corrupts the low
      bits past 2^53 — i.e. from precision 11 up.  lonv/latv stay < 2^28,
      where floor/mod in double is exact.)

    All integer floor/mod arithmetic + substr/|| — identical text runs
    as Spark whole-stage codegen and as the DuckDB oracle.  Verified
    against the classic vectors (u4pruydqqvj at p=11, ezs42) in tests."""
    total = 5 * precision
    lonbits, latbits = (total + 1) // 2, total // 2
    out = {
        "lonv": (f"least(CAST(floor(({{lon}} + 180.0) / 360.0 * "
                 f"{_r(float(1 << lonbits))}) AS BIGINT), {(1 << lonbits) - 1})"),
        "latv": (f"least(CAST(floor(({{lat}} + 90.0) / 180.0 * "
                 f"{_r(float(1 << latbits))}) AS BIGINT), {(1 << latbits) - 1})"),
    }

    def _bit(pos: int) -> str:
        # geohash interleave counts from the MSB: stream index j = 0 is
        # lon's top bit, j = 1 lat's top bit, …  (an LSB-parity shortcut
        # flips lon/lat whenever 5·precision is even — caught by the
        # prefix-coarsening test at p=6)
        j = total - 1 - pos
        if j % 2 == 0:
            src, k = "{lonv}", lonbits - 1 - j // 2
        else:
            src, k = "{latv}", latbits - 1 - (j - 1) // 2
        return f"(CAST(floor({src} / {_r(float(1 << k))}) AS BIGINT) % 2)"

    out["morton"] = "(" + " + ".join(
        f"{_bit(p)} * {1 << p}" for p in range(total)) + ")"
    chars = []
    for i in range(1, precision + 1):
        lo = total - 5 * i  # bit positions [lo, lo+4] make character i
        v = " + ".join(f"{_bit(lo + b)} * {1 << b}" for b in range(5))
        chars.append(f"substr('{GEOHASH32}', CAST(({v}) AS INT) + 1, 1)")
    out["gh"] = " || ".join(chars)
    return out


def slerp_lonlat(lon1: str, lat1: str, lon2: str, lat2: str,
                 f: str) -> tuple[str, str]:
    """Great-circle interpolation (spherical slerp) at fraction ``f`` as
    SQL — lon/lat in degrees in, degrees out.  Dialect-free (degrees/
    radians/atan2/asin/acos/least/greatest exist identically in Spark SQL
    and DuckDB), so ONE text feeds the engine codegen column AND the
    oracle, keeping both expression trees bit-identical."""
    x1 = f"(cos(radians({lat1})) * cos(radians({lon1})))"
    y1 = f"(cos(radians({lat1})) * sin(radians({lon1})))"
    z1 = f"sin(radians({lat1}))"
    x2 = f"(cos(radians({lat2})) * cos(radians({lon2})))"
    y2 = f"(cos(radians({lat2})) * sin(radians({lon2})))"
    z2 = f"sin(radians({lat2}))"
    d = (f"acos(least(greatest({x1} * {x2} + {y1} * {y2} + {z1} * {z2},"
         f" -1.0), 1.0))")
    a = f"(sin((1.0 - {f}) * {d}) / sin({d}))"
    b = f"(sin({f} * {d}) / sin({d}))"
    x = f"({a} * {x1} + {b} * {x2})"
    y = f"({a} * {y1} + {b} * {y2})"
    z = f"({a} * {z1} + {b} * {z2})"
    lon = f"degrees(atan2({y}, {x}))"
    lat = f"degrees(asin(least(greatest({z}, -1.0), 1.0)))"
    return lon, lat


def hilbert_stages_sql(res: int, x0: str, y0: str) -> list[tuple[str, dict[str, str]]]:
    """Hilbert curve xy→d on a 2^res × 2^res grid as ``res`` staged
    select-lists — dialect-common (integer &, %, CASE only; XOR is
    replaced by the arithmetic identity (3·rx)^ry = 3·rx + ry − 2·rx·ry
    over rx, ry ∈ {0,1}), consumed by BOTH the Spark codegen path
    (``index.hilbert.hilbert_cols``) and the DuckDB oracle — the same
    one-transliteration discipline as ``datum_shift_stages_sql``.

    Classic iterative formulation (public domain, e.g. Wikipedia
    "Hilbert curve" C code): per bit level s = 2^(res−1)…1,
        rx = (x & s) > 0;  ry = (y & s) > 0
        d += s² · ((3·rx) ^ ry)
        if ry == 0: { if rx == 1: x, y = s−1−x, s−1−y };  swap(x, y)

    All-integer state ⇒ bit-identical cross-engine.  Input exprs
    ``x0, y0`` are column ids at the target res; state columns are
    hx, hy, hd.
    """
    stages: list[tuple[str, dict[str, str]]] = []
    for k in range(res):
        s = 1 << (res - 1 - k)
        x = x0 if k == 0 else "hx"
        y = y0 if k == 0 else "hy"
        d = "0" if k == 0 else "hd"
        rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
        t = f"(3 * {rx} + {ry} - 2 * {rx} * {ry})"
        flip_x = f"(CASE WHEN {rx} = 1 THEN {s - 1} - {x} ELSE {x} END)"
        flip_y = f"(CASE WHEN {rx} = 1 THEN {s - 1} - {y} ELSE {y} END)"
        stages.append((f"h{k}", {
            "hd": f"({d} + {s * s} * {t})",
            # ry = 0: flip (when rx = 1) then swap; ry = 1: unchanged
            "hx": f"(CASE WHEN {ry} = 0 THEN {flip_y} ELSE {x} END)",
            "hy": f"(CASE WHEN {ry} = 0 THEN {flip_x} ELSE {y} END)",
        }))
    return stages

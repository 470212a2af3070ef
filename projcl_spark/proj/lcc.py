"""Lambert Conformal Conic (spherical + ellipsoidal), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_lambert_conformal_conic.opencl``
with (n, c, rho0) precomputed in float64 (``src/projcl_run.c:444-500``).
The degenerate symmetric-parallel case (n → 0) is handled one level up by a
plan-time rewrite to Mercator (see ``core.params.mercator_params_from_
pathological_lcc``; reference dispatch ``src/projcl_project.c:99-109``).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mod_pi, msfn, phi2, tsfn


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    phi0 = math.radians(p.lat0)
    phi1 = math.radians(p.rlat1)
    phi2_ = math.radians(p.rlat2)
    sinphi1, cosphi1 = math.sin(phi1), math.cos(phi1)
    secant = abs(phi1 - phi2_) >= 1e-7
    n = sinphi1
    if info.is_spherical:
        if secant:
            n = math.log(cosphi1 / math.cos(phi2_)) / (
                math.asinh(math.tan(phi2_)) - math.asinh(math.tan(phi1))
            )
        c = cosphi1 * math.tan(math.pi / 4 + 0.5 * phi1) ** n / n
        rho0 = c * math.tan(math.pi / 4 + 0.5 * phi0) ** (-n)
    else:
        m1 = msfn(sinphi1, cosphi1, info.ecc2)
        ml1 = tsfn(phi1, sinphi1, info.ecc)
        if secant:
            sinphi2 = math.sin(phi2_)
            n = math.log(m1 / msfn(sinphi2, math.cos(phi2_), info.ecc2))
            n /= math.log(ml1 / tsfn(phi2_, sinphi2, info.ecc))
        c = m1 * ml1 ** (-n) / n
        rho0 = c * tsfn(phi0, math.sin(phi0), info.ecc) ** n
    return {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "scale": p.scale * info.major_axis,
        "x0": p.x0,
        "y0": p.y0,
        "lambda0": math.radians(p.lon0),
        "rho0": rho0,
        "c": c,
        "n": n,
    }


def forward(lon, lat, C):
    lam = np.radians(lon) - C["lambda0"]
    phi = np.radians(lat)
    n, c = C["n"], C["c"]
    if C["spherical"]:
        rho = c * np.exp(-n * np.arcsinh(np.tan(phi)))
    else:
        e = C["ecc"]
        rho = c * np.exp(-n * (np.arcsinh(np.tan(phi)) - e * np.arctanh(e * np.sin(phi))))
    x = rho * np.sin(lam * n)
    y = C["rho0"] - rho * np.cos(lam * n)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = C["rho0"] - (y - C["y0"]) / C["scale"]
    n, c = C["n"], C["c"]
    rho = np.copysign(np.hypot(xs, ys), n)
    safe_rho = np.where(rho == 0.0, 1.0, rho)
    log_ts = np.log(safe_rho / c) / n
    if C["spherical"]:
        phi = np.where(rho == 0.0, np.copysign(np.pi / 2, n), -np.arctan(np.sinh(log_ts)))
    else:
        phi = np.where(rho == 0.0, np.copysign(np.pi / 2, n), phi2(log_ts, C["ecc"]))
    sign = np.copysign(1.0, n)
    lam = np.arctan2(xs * sign, ys * sign) / n
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

"""Albers Equal-Area conic (spherical + ellipsoidal), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_albers_equal_area.opencl``
with host precompute of (n, c, rho0) in float64
(``src/projcl_run.c:310-367``).  The ellipsoidal inverse latitude iteration
(``phi1_``, kernel lines 4-21) runs a fixed 6 rounds (ALBERS_EQUAL_AREA_N_ITER,
peel.opencl:13) — here with an extra convergence short-circuit.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mod_pi, msfn, qsfn

N_ITER = 6
TOL7 = 1e-7


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    phi1 = math.radians(p.rlat1)
    phi2 = math.radians(p.rlat2)
    phi0 = math.radians(p.lat0)
    sinphi1, cosphi1 = math.sin(phi1), math.cos(phi1)
    if info.is_spherical:
        n = 0.5 * (sinphi1 + math.sin(phi2))
        c = 1.0 + math.sin(phi2) * sinphi1
        rho0 = math.sqrt(c - 2.0 * n * math.sin(phi0))
    else:
        m1 = msfn(sinphi1, cosphi1, info.ecc2)
        ml1 = qsfn(sinphi1, info.ecc, info.one_ecc2)
        n = sinphi1
        if abs(phi1 - phi2) >= 1e-7:
            sinphi2 = math.sin(phi2)
            m2 = msfn(sinphi2, math.cos(phi2), info.ecc2)
            ml2 = qsfn(sinphi2, info.ecc, info.one_ecc2)
            n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
        c = m1 * m1 + ml1 * n
        rho0 = math.sqrt(c - n * qsfn(math.sin(phi0), info.ecc, info.one_ecc2))
    return {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "one_ecc2": info.one_ecc2,
        "ec": info.ec,
        "scale": p.scale * info.major_axis / n,
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
        rho = np.sqrt(c - 2.0 * n * np.sin(phi))
    else:
        rho = np.sqrt(c - n * qsfn(np.sin(phi), C["ecc"], C["one_ecc2"]))
    x = rho * np.sin(lam * n)
    y = C["rho0"] - rho * np.cos(lam * n)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def _phi1(qs, e: float, one_es: float):
    """Inverse of the authalic q function (fixed-round Newton)."""
    phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
    for _ in range(N_ITER):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        con = e * sinphi
        com = 1.0 - con * con
        dphi = (
            0.5
            * com
            * com
            / np.where(np.abs(cosphi) < 1e-15, 1e-15, cosphi)
            * (qs / one_es - sinphi / com - np.arctanh(con) / e)
        )
        phi = phi + dphi
        if np.all(np.abs(dphi) <= 1e-7):
            break
    return phi


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = C["rho0"] - (y - C["y0"]) / C["scale"]
    n, c = C["n"], C["c"]
    qs = (c - (xs * xs + ys * ys)) / n
    if C["spherical"]:
        phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
    else:
        at_pole = np.abs(C["ec"] - np.abs(qs)) <= TOL7
        phi = np.where(at_pole, np.copysign(np.pi / 2, qs), _phi1(np.where(at_pole, 0.0, qs), C["ecc"], C["one_ecc2"]))
    lam = np.arctan2(xs, ys) / n
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

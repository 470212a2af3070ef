"""Oblique Stereographic (ellipsoidal double projection), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_oblique_stereographic.opencl``
with c0/log(k0) precomputed in float64 (``src/projcl_run.c:520-566``):
ellipsoid → conformal sphere (Gauss) → stereographic plane.  The reference
registers only the ellipsoidal kernels; with a spherical spheroid, c0 = 1 and
k0 = 1, so the same code path degenerates to plain spherical stereographic
(matching the host's sinPhiC0 = sinPhi0 branch, projcl_run.c:554-557).
The inverse sphere→ellipsoid latitude iterates ≤6 rounds
(OBLIQUE_STEREOGRAPHIC_N_ITER, peel.opencl:14).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mod_pi

N_ITER = 6
TOL7 = 1e-7


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    phi0 = math.radians(p.lat0)
    sin_phi0, cos_phi0 = math.sin(phi0), math.cos(phi0)
    scale_r2 = (
        2.0 * p.scale * info.major_axis * math.sqrt(info.one_ecc2) / (1.0 - info.ecc2 * sin_phi0**2)
    )
    C = {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "scale": scale_r2,
        "x0": p.x0,
        "y0": p.y0,
        "lambda0": math.radians(p.lon0),
    }
    if info.is_spherical:
        C.update(c0=1.0, log_k0=0.0, sinPhiC0=sin_phi0, cosPhiC0=cos_phi0)
    else:
        e = info.ecc
        c0 = math.sqrt(1.0 + info.ecc2 * cos_phi0**4 / info.one_ecc2)
        phi_c0 = math.asin(sin_phi0 / c0)
        k0 = math.tan(0.5 * phi_c0 + math.pi / 4) / (
            math.tan(0.5 * phi0 + math.pi / 4) ** c0
            * ((1.0 - e * sin_phi0) / (1.0 + e * sin_phi0)) ** (0.5 * c0 * e)
        )
        C.update(c0=c0, log_k0=math.log(k0), sinPhiC0=math.sin(phi_c0), cosPhiC0=math.cos(phi_c0))
    return C


def forward(lon, lat, C):
    lam_ell = np.radians(lon) - C["lambda0"]
    phi_ell = np.radians(lat)
    c0, log_k0, e = C["c0"], C["log_k0"], C["ecc"]
    # ellipsoid -> conformal sphere
    lam = c0 * lam_ell
    if C["spherical"]:
        phi = phi_ell
    else:
        phi = np.arctan(
            np.sinh(log_k0 + c0 * (np.arcsinh(np.tan(phi_ell)) - e * np.arctanh(e * np.sin(phi_ell))))
        )
    # sphere -> plane
    sin_phi, cos_phi = np.sin(phi), np.cos(phi)
    sin_lam, cos_lam = np.sin(lam), np.cos(lam)
    k = C["scale"] / (1.0 + C["sinPhiC0"] * sin_phi + C["cosPhiC0"] * cos_phi * cos_lam)
    x = cos_phi * sin_lam
    y = C["cosPhiC0"] * sin_phi - C["sinPhiC0"] * cos_phi * cos_lam
    return C["x0"] + k * x, C["y0"] + k * y


def _phi_sph2ell(phi, e: float, log_k0: float, c0: float):
    """Conformal-sphere → geodetic latitude, fixed N_ITER rounds.

    No early break: the contraction is LINEAR (~e² per round), so stopping
    at a 1e-7 step leaves a ~4e-8-degree residual — enough to flip values
    sitting on a 1e-6-degree quantization boundary against the oracle's
    full unroll (observed at sf0.01).  Running all 6 rounds lands at the
    fixed point to ~1e-15 rad and costs nothing (vectorized)."""
    log_num = (np.arcsinh(np.tan(phi)) - log_k0) / c0
    phi_ell = phi
    for _ in range(N_ITER):
        phi_ell = np.arctan(np.sinh(log_num + e * np.arctanh(e * np.sin(phi_ell))))
    return phi_ell


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    rho = np.hypot(xs, ys)
    two_atan = 2.0 * np.arctan(rho)
    sin_c, cos_c = np.sin(two_atan), np.cos(two_atan)
    safe_rho = np.where(rho == 0.0, 1.0, rho)
    phi = np.arcsin(
        np.clip(
            np.where(
                rho == 0.0,
                C["sinPhiC0"],
                cos_c * C["sinPhiC0"] + ys * sin_c * C["cosPhiC0"] / safe_rho,
            ),
            -1.0,
            1.0,
        )
    )
    lam = np.arctan2(xs * sin_c, safe_rho * C["cosPhiC0"] * cos_c - ys * C["sinPhiC0"] * sin_c)
    lam = lam / C["c0"]
    if not C["spherical"]:
        phi = _phi_sph2ell(phi, C["ecc"], C["log_k0"], C["c0"])
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

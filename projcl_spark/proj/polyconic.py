"""American Polyconic (spherical + ellipsoidal), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_american_polyconic.opencl``
(closed-form forward with the half-angle trick for 1−cos E, kernel line 43;
inverse = fixed-count Newton–Raphson with the full 2×2 Jacobian — 6 spherical
/ 8 ellipsoidal rounds, kernel lines 73 and 177) with ml0/en precomputed in
float64 (``src/projcl_run.c:369-395``).

Improvement over the reference: the equator (sin φ = 0) is handled by its
analytic limit (x = λ·cos φ, y = ml−ml0) instead of producing inf·0 NaNs.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mlfn, mlfn1, mod_pi

N_ITER_S = 6
N_ITER_E = 8
_EQ_EPS = 1e-9


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    phi0 = math.radians(p.lat0)
    return {
        "spherical": info.is_spherical,
        "ecc2": info.ecc2,
        "scale": p.scale * info.major_axis,
        "x0": p.x0,
        "y0": p.y0,
        "phi0": phi0,
        "lambda0": math.radians(p.lon0),
        "ml0": mlfn(phi0, math.sin(phi0), math.cos(phi0), info.en),
        "en": info.en,
    }


def forward(lon, lat, C):
    lam = np.radians(lon) - C["lambda0"]
    phi = np.radians(lat)
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    eq = np.abs(sinphi) < _EQ_EPS
    safe_sin = np.where(eq, 1.0, sinphi)
    sinE = np.sin(lam * sinphi)
    half = np.tan(0.5 * lam * sinphi)
    if C["spherical"]:
        cot = cosphi / safe_sin
        x = np.where(eq, lam, cot * sinE)
        y = np.where(eq, -C["phi0"], phi - C["phi0"] + cot * sinE * half)
    else:
        ms = cosphi / (safe_sin * np.sqrt(1.0 - C["ecc2"] * sinphi * sinphi))
        ml = mlfn(phi, sinphi, cosphi, C["en"])
        x = np.where(eq, lam * cosphi / np.sqrt(1.0 - C["ecc2"] * sinphi * sinphi), ms * sinE)
        y = np.where(eq, ml - C["ml0"], (ml - C["ml0"]) + ms * sinE * half)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    phi0 = C["phi0"]
    with np.errstate(divide="ignore", invalid="ignore"):
        if C["spherical"]:
            phi = ys + phi0
            # an exactly-equatorial guess makes the Jacobian 0/0; nudge off it
            phi = np.where(np.abs(phi) < 1e-12, 1e-12, phi)
            sinphi, cosphi = np.sin(phi), np.cos(phi)
            lam = np.arcsin(np.clip(xs * sinphi / cosphi, -1.0, 1.0)) / np.where(np.abs(sinphi) < _EQ_EPS, _EQ_EPS, sinphi)
            for _ in range(N_ITER_S):
                sin_ls, cos_ls = np.sin(lam * sinphi), np.cos(lam * sinphi)
                cos_ls1 = sin_ls * np.tan(0.5 * lam * sinphi)  # 1 - cos
                c = lam * cosphi * cosphi / sinphi
                f1 = cosphi * sin_ls / sinphi - xs
                f2 = phi - phi0 + cosphi * cos_ls1 / sinphi - ys
                df1phi = c * cos_ls - sin_ls / (sinphi * sinphi)
                df2phi = 1.0 + c * sin_ls - cos_ls1 / (sinphi * sinphi)
                df1lam = cosphi * cos_ls
                df2lam = cosphi * sin_ls
                inv_det = 1.0 / (df1phi * df2lam - df2phi * df1lam)
                dphi = (f1 * df2lam - f2 * df1lam) * inv_det
                dlam = (f2 * df1phi - f1 * df2phi) * inv_det
                phi = phi - dphi
                lam = lam - dlam
                sinphi, cosphi = np.sin(phi), np.cos(phi)
        else:
            es, en, ml0 = C["ecc2"], C["en"], C["ml0"]
            phi = ys + phi0
            phi = phi - (mlfn(phi, np.sin(phi), np.cos(phi), en) - (ys + ml0)) / mlfn1(
                phi, np.sin(phi), np.cos(phi), en
            )
            phi = np.where(np.abs(phi) < 1e-12, 1e-12, phi)
            sinphi, cosphi = np.sin(phi), np.cos(phi)
            mlp = np.sqrt(1.0 - es * sinphi * sinphi)
            lam = np.arcsin(np.clip(xs * sinphi / cosphi * mlp, -1.0, 1.0)) / np.where(
                np.abs(sinphi) < _EQ_EPS, _EQ_EPS, sinphi
            )
            for _ in range(N_ITER_E):
                tanphi = sinphi / cosphi
                sin_ls, cos_ls = np.sin(lam * sinphi), np.cos(lam * sinphi)
                sin_l2s, cos_l2s = np.sin(0.5 * lam * sinphi), np.cos(0.5 * lam * sinphi)
                f1 = sin_ls / tanphi / mlp - xs
                f2 = mlfn(phi, sinphi, cosphi, en) - ml0 + xs * sin_l2s / cos_l2s - ys
                df1lam = cosphi / mlp * cos_ls
                df2lam = cosphi / mlp * sin_ls
                c1 = es * (1.0 + cosphi * cosphi) / (mlp * (1.0 - es * sinphi * sinphi))
                c2 = 1.0 / (sinphi * sinphi * mlp * (1.0 - es * sinphi * sinphi))
                df1phi = lam * cosphi / tanphi / mlp * cos_ls + sin_ls * (c1 - c2)
                df2phi = mlfn1(phi, sinphi, cosphi, en) + 0.5 * lam * xs * cosphi / (cos_l2s * cos_l2s)
                inv_det = 1.0 / (df1phi * df2lam - df2phi * df1lam)
                dphi = (f1 * df2lam - f2 * df1lam) * inv_det
                dlam = (f2 * df1phi - f1 * df2phi) * inv_det
                phi = phi - dphi
                lam = lam - dlam
                sinphi, cosphi = np.sin(phi), np.cos(phi)
                mlp = np.sqrt(1.0 - es * sinphi * sinphi)
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

"""Winkel Tripel (spherical only), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_winkel_tripel.opencl``:
forward = mean of equirectangular and Aitoff; inverse = 4 rounds of
Newton–Raphson with the full 2×2 Jacobian, following Ipbüker & Bildirici,
"Computer Program for the Inverse Transformation of the Winkel Projection",
J. Surveying Eng. 131(4), 2005 (with the reference's df1lam sign fix and
better longitude initial guess).  Default standard parallel:
cos φ₁ = 2/π when rlat1 unset (``src/projcl_run.c:620``).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from ..core.spheroid import Spheroid, get_spheroid_info

N_ITER = 4


def prepare(p: ProjectionParams) -> dict:
    sphere = get_spheroid_info(Spheroid.SPHERE)  # reference forces sphere (projcl_run.c:618)
    cosphi1 = 2.0 / math.pi if math.isnan(p.rlat1) else math.cos(math.radians(p.rlat1))
    return {
        "scale": p.scale * sphere.major_axis,
        "x0": p.x0,
        "y0": p.y0,
        "lambda0": math.radians(p.lon0),
        "cosphi1": cosphi1,
    }


def forward(lon, lat, C):
    lam = np.radians(lon) - C["lambda0"]
    phi = np.radians(lat)
    lam2 = 0.5 * lam
    sin_phi, cos_phi = np.sin(phi), np.cos(phi)
    sin_lam2, cos_lam2 = np.sin(lam2), np.cos(lam2)
    cos_d = cos_phi * cos_lam2
    d = np.arccos(np.clip(cos_d, -1.0, 1.0))
    sin_d = np.sqrt(np.maximum(1.0 - cos_d * cos_d, 0.0))
    d_over_sin = np.where(d == 0.0, 1.0, d / np.where(sin_d == 0.0, 1.0, sin_d))
    x = lam2 * C["cosphi1"] + d_over_sin * cos_phi * sin_lam2
    y = 0.5 * (phi + d_over_sin * sin_phi)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    cosphi1 = C["cosphi1"]
    phi = ys
    sin_phi, cos_phi = np.sin(phi), np.cos(phi)
    lam = 2.0 * xs / (cos_phi + cosphi1)
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(N_ITER):
            sin2phi = 2.0 * sin_phi * cos_phi
            sin_lam2, cos_lam2 = np.sin(0.5 * lam), np.cos(0.5 * lam)
            sin_lam = 2.0 * sin_lam2 * cos_lam2
            d = np.arccos(np.clip(cos_phi * cos_lam2, -1.0, 1.0))
            c = np.sin(d)
            inv_c = 1.0 / (c * c)
            inv_c12 = 1.0 / c
            d_inv_c32 = d * inv_c * inv_c12
            f1 = d * cos_phi * sin_lam2 * inv_c12 + 0.5 * lam * cosphi1 - xs
            f2 = 0.5 * d * sin_phi * inv_c12 + 0.5 * phi - ys
            df1phi = 0.25 * sin_lam * sin2phi * inv_c - d_inv_c32 * sin_phi * sin_lam2
            df1lam = 0.5 * (
                cos_phi * cos_phi * sin_lam2 * sin_lam2 * inv_c
                + d_inv_c32 * cos_phi * cos_lam2 * sin_phi * sin_phi
                + cosphi1
            )
            df2phi = 0.5 * (
                sin_phi * sin_phi * cos_lam2 * inv_c
                + d_inv_c32 * sin_lam2 * sin_lam2 * cos_phi
                + 1.0
            )
            df2lam = 0.125 * (sin2phi * sin_lam2 * inv_c - d_inv_c32 * sin_phi * cos_phi * cos_phi * sin_lam)
            inv_det = 1.0 / (df1phi * df2lam - df2phi * df1lam)
            dphi = -(f1 * df2lam - f2 * df1lam) * inv_det
            dlam = -(f2 * df1phi - f1 * df2phi) * inv_det
            # center point (x=y=0 → d=0) is a fixed point: keep (0, 0)
            dphi = np.where(np.isfinite(dphi), dphi, 0.0)
            dlam = np.where(np.isfinite(dlam), dlam, 0.0)
            phi = phi + dphi
            lam = lam + dlam
            sin_phi, cos_phi = np.sin(phi), np.cos(phi)
    return np.degrees(lam + C["lambda0"]), np.degrees(phi)

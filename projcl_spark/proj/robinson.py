"""Robinson pseudocylindrical (spherical only), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_robinson.opencl``: the
standard 19-node 5°-interval cubic-coefficient tables for X and Y (public
PROJ lineage data, credited in the kernel header to the proj-4 mailing list)
with forward = table polynomial × FXC/FYC, and inverse = node search in Y
followed by Newton root-polishing, then X-table division for longitude.
Host enqueue ``src/projcl_run.c:568-586``; spherical radius only.

Vectorization strategy (reference runs one scalar point per work-item):
``np.searchsorted`` for the node walk and a fixed Newton loop with a
convergence mask for the root polish.
"""

from __future__ import annotations

import numpy as np

from ..core.params import ProjectionParams

FXC = 0.8487
FYC = 1.3523
C1 = 11.45915590261646417544  # 1 / (5 degrees in radians)
RC1 = 0.08726646259971647884  # 5 degrees in radians
NODES = 18
EPS6 = 1e-6

# Cubic coefficients per 5-degree node, evaluated in *degrees* past the node.
_X = np.array([
    [1, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
])

_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1.0, 0.00328947, -0.000319159, -4.2106e-06],
])


def _v(coef, z):
    """coef: (n,4) rows gathered per point; z: degrees past node."""
    return coef[..., 0] + z * (coef[..., 1] + z * (coef[..., 2] + z * coef[..., 3]))


def _dv(coef, z):
    return coef[..., 1] + z * (2.0 * coef[..., 2] + z * 3.0 * coef[..., 3])


def prepare(p: ProjectionParams) -> dict:
    # reference forces the authalic sphere regardless of the caller's
    # spheroid (projcl_run.c:573)
    from ..core.spheroid import Spheroid, get_spheroid_info

    sphere = get_spheroid_info(Spheroid.SPHERE)
    return {"scale": p.scale * sphere.major_axis, "x0": p.x0, "y0": p.y0}


def forward(lon, lat, C):
    lam = np.radians(lon)
    phi = np.radians(lat)
    dphi = np.abs(phi)
    index = np.minimum(np.floor(dphi * C1).astype(np.int64), NODES - 1)
    z = np.degrees(dphi - RC1 * index)
    x = _v(_X[index], z) * FXC * lam
    y = np.copysign(_v(_Y[index], z) * FYC, phi)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    lam = xs / FXC
    phi_n = np.abs(ys / FYC)  # normalized [0, 1]

    at_pole = phi_n >= 1.0
    # node walk: Y[:,0] is strictly increasing
    index = np.clip(np.searchsorted(_Y[:, 0], phi_n, side="right") - 1, 0, NODES - 1)
    Tc = _Y[index].copy()
    upper = _Y[np.minimum(index + 1, NODES), 0]
    t = 5.0 * (phi_n - Tc[..., 0]) / np.where(upper == Tc[..., 0], 1.0, upper - Tc[..., 0])
    Tc[..., 0] -= phi_n
    for _ in range(12):  # Newton (reference loops to |dt| < 1e-6)
        dv = _dv(Tc, t)
        dt = _v(Tc, t) / np.where(np.abs(dv) < 1e-18, 1e-18, dv)
        t = t - dt
        if np.all(np.abs(dt) < EPS6):
            break
    phi = np.radians(5.0 * index + t)
    lam_gen = lam / _v(_X[index], t)

    phi = np.where(at_pole, np.pi / 2, phi)
    lam = np.where(at_pole, lam / _X[NODES, 0], lam_gen)
    phi = np.copysign(phi, ys)
    return np.degrees(lam), np.degrees(phi)

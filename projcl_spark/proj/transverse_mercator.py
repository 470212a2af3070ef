"""Transverse Mercator (spherical exact + ellipsoidal Krüger order-4).

Semantics of ``/root/reference/kernel/pl_project_transverse_mercator.opencl``
(Karney 2011 series; the reference cites https://arxiv.org/pdf/1002.1417.pdf)
with α/β/A precomputed per spheroid (``src/projcl_spheroid.c:67-100``,
enqueue ``src/projcl_run.c:588-609``).  Projected scale = k0·a·A.
The ellipsoidal inverse applies one Newton step on τ (kernel lines 205-209).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mod_pi


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    return {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "one_ecc2": info.one_ecc2,
        "scale": p.scale * info.major_axis * (1.0 if info.is_spherical else info.krueger_A),
        "x0": p.x0,
        "y0": p.y0,
        "lambda0": math.radians(p.lon0),
        "alpha": info.krueger_alpha,
        "beta": info.krueger_beta,
    }


def _angle_ladder(t2, hyperbolic: bool):
    """sin/cos (or sinh/cosh) of 2t,4t,6t,8t via double/sum identities."""
    if hyperbolic:
        s2, c2 = np.sinh(t2), np.cosh(t2)
        c4 = 2.0 * c2 * c2 - 1.0
        s4 = 2.0 * s2 * c2
        s6 = s4 * c2 + c4 * s2
        c6 = c4 * c2 + s4 * s2
    else:
        s2, c2 = np.sin(t2), np.cos(t2)
        c4 = 2.0 * c2 * c2 - 1.0
        s4 = 2.0 * s2 * c2
        s6 = s4 * c2 + c4 * s2
        c6 = c4 * c2 - s4 * s2
    s8 = 2.0 * s4 * c4
    c8 = 2.0 * c4 * c4 - 1.0
    return (s2, s4, s6, s8), (c2, c4, c6, c8)


def forward(lon, lat, C):
    lam = np.radians(lon) - C["lambda0"]
    phi = np.radians(lat)
    sin_lam, cos_lam = np.sin(lam), np.cos(lam)
    tau = np.tan(phi)
    if C["spherical"]:
        y = np.arctan2(tau, cos_lam)
        x = np.arcsinh(sin_lam / np.hypot(tau, cos_lam))
    else:
        e = C["ecc"]
        sigma = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        tau1 = tau * np.hypot(1.0, sigma) - sigma * np.hypot(1.0, tau)
        xi = np.arctan2(tau1, cos_lam)
        eta = np.arcsinh(sin_lam / np.hypot(tau1, cos_lam))
        s, c = _angle_ladder(2.0 * xi, hyperbolic=False)
        sh, ch = _angle_ladder(2.0 * eta, hyperbolic=True)
        a = C["alpha"]
        y = xi + a[0] * s[0] * ch[0] + a[1] * s[1] * ch[1] + a[2] * s[2] * ch[2] + a[3] * s[3] * ch[3]
        x = eta + a[0] * c[0] * sh[0] + a[1] * c[1] * sh[1] + a[2] * c[2] * sh[2] + a[3] * c[3] * sh[3]
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    if C["spherical"]:
        sinh_x = np.sinh(xs)
        sin_y, cos_y = np.sin(ys), np.cos(ys)
        lam = np.arctan2(sinh_x, cos_y)
        phi = np.arctan2(sin_y, np.hypot(sinh_x, cos_y))
    else:
        s, c = _angle_ladder(2.0 * ys, hyperbolic=False)
        sh, ch = _angle_ladder(2.0 * xs, hyperbolic=True)
        b = C["beta"]
        xi = ys - (b[0] * s[0] * ch[0] + b[1] * s[1] * ch[1] + b[2] * s[2] * ch[2] + b[3] * s[3] * ch[3])
        eta = xs - (b[0] * c[0] * sh[0] + b[1] * c[1] * sh[1] + b[2] * c[2] * sh[2] + b[3] * c[3] * sh[3])
        sinh_eta = np.sinh(eta)
        sin_xi, cos_xi = np.sin(xi), np.cos(xi)
        tau0 = sin_xi / np.hypot(sinh_eta, cos_xi)
        tau = tau0
        e, one_es = C["ecc"], C["one_ecc2"]
        # one Newton step on tau (Karney eq. 19-21)
        sigma = np.sinh(e * np.arctanh(e * tau / np.hypot(1.0, tau)))
        tau_p = tau * np.hypot(1.0, sigma) - sigma * np.hypot(1.0, tau)
        dtau = (tau0 - tau_p) / np.hypot(1.0, tau_p) * (1.0 + one_es * tau * tau) / (one_es * np.hypot(1.0, tau))
        tau = tau + dtau
        lam = np.arctan2(sinh_eta, cos_xi)
        phi = np.arctan(tau)
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

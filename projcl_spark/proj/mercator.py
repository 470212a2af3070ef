"""Mercator projection (spherical + ellipsoidal), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_mercator.opencl`` with host
precompute ``src/projcl_run.c:502-518``: the projected scale constant is
``k0 * major_axis``; the kernel takes no central meridian (lon0 is folded
into x0 by callers — see the pathological-LCC rewrite, projcl_params.c:52-61).
"""

from __future__ import annotations

import numpy as np

from ..core.params import ProjectionParams
from .helpers import phi2


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    return {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "scale": p.scale * info.major_axis,
        "x0": p.x0,
        "y0": p.y0,
    }


def forward(lon, lat, C):
    lam = np.radians(lon)
    phi = np.radians(lat)
    x = lam
    if C["spherical"]:
        y = np.arcsinh(np.tan(phi))
    else:
        e = C["ecc"]
        y = np.arcsinh(np.tan(phi)) - e * np.arctanh(e * np.sin(phi))
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    if C["spherical"]:
        phi = np.arctan(np.sinh(ys))
    else:
        phi = phi2(-ys, C["ecc"])
    return np.degrees(xs), np.degrees(phi)

"""Lambert Azimuthal Equal-Area (spherical + ellipsoidal), vectorized numpy.

Semantics of ``/root/reference/kernel/pl_project_lambert_azimuthal_equal_area
.opencl`` with host precompute of qp/sinB1/cosB1/rq/dd/xmf/ymf
(``src/projcl_run.c:397-442``) and the authalic series ``apa``
(``src/projcl_spheroid.c:62-64``).  Oblique aspect only (like the reference).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.params import ProjectionParams
from .helpers import mod_pi, qsfn


def prepare(p: ProjectionParams) -> dict:
    info = p.info()
    phi0 = math.radians(p.lat0)
    C = {
        "spherical": info.is_spherical,
        "ecc": info.ecc,
        "one_ecc2": info.one_ecc2,
        "scale": p.scale * info.major_axis,
        "x0": p.x0,
        "y0": p.y0,
        "lambda0": math.radians(p.lon0),
    }
    if info.is_spherical:
        C["sinPhi0"] = math.sin(phi0)
        C["cosPhi0"] = math.cos(phi0)
    else:
        qp = qsfn(1.0, info.ecc, info.one_ecc2)
        sin_phi0 = math.sin(phi0)
        sinB1 = qsfn(sin_phi0, info.ecc, info.one_ecc2) / qp
        cosB1 = math.sqrt(1.0 - sinB1 * sinB1)
        rq = math.sqrt(0.5 * qp)
        dd = math.cos(phi0) / (math.sqrt(1.0 - info.ecc2 * sin_phi0 * sin_phi0) * rq * cosB1)
        C.update(
            qp=qp, sinB1=sinB1, cosB1=cosB1, rq=rq, apa=info.apa, dd=dd,
            xmf=rq * dd, ymf=rq / dd,
        )
    return C


def forward(lon, lat, C):
    lam = np.radians(lon) - C["lambda0"]
    phi = np.radians(lat)
    sin_lam, cos_lam = np.sin(lam), np.cos(lam)
    if C["spherical"]:
        sin_phi, cos_phi = np.sin(phi), np.cos(phi)
        b = np.sqrt(2.0 / (1.0 + C["sinPhi0"] * sin_phi + C["cosPhi0"] * cos_phi * cos_lam))
        x = b * cos_phi * sin_lam
        y = b * (C["cosPhi0"] * sin_phi - C["sinPhi0"] * cos_phi * cos_lam)
    else:
        sinB = qsfn(np.sin(phi), C["ecc"], C["one_ecc2"]) / C["qp"]
        cosB = np.sqrt(1.0 - sinB * sinB)
        b = np.sqrt(2.0 / (1.0 + C["sinB1"] * sinB + C["cosB1"] * cosB * cos_lam))
        x = C["xmf"] * b * cosB * sin_lam
        y = C["ymf"] * b * (C["cosB1"] * sinB - C["sinB1"] * cosB * cos_lam)
    return C["x0"] + C["scale"] * x, C["y0"] + C["scale"] * y


def inverse(x, y, C):
    xs = (x - C["x0"]) / C["scale"]
    ys = (y - C["y0"]) / C["scale"]
    if C["spherical"]:
        rho2 = xs * xs + ys * ys
        cosc = 1.0 - 0.5 * rho2
        sinc = np.sqrt(np.maximum(1.0 - 0.25 * rho2, 0.0))  # sin(c)/rho
        phi = np.arcsin(np.clip(cosc * C["sinPhi0"] + ys * sinc * C["cosPhi0"], -1.0, 1.0))
        lam = np.arctan2(xs * sinc, C["cosPhi0"] * cosc - ys * C["sinPhi0"] * sinc)
    else:
        xs = xs / C["dd"]
        ys = ys * C["dd"]
        rq = C["rq"]
        rho2 = (xs * xs + ys * ys) / (rq * rq)
        cosce = 1.0 - 0.5 * rho2
        since = np.sqrt(np.maximum(1.0 - 0.25 * rho2, 0.0)) / rq  # sin(Ce)/rho
        beta = np.arcsin(np.clip(cosce * C["sinB1"] + ys * since * C["cosB1"], -1.0, 1.0))
        lam = np.arctan2(xs * since, C["cosB1"] * cosce - ys * C["sinB1"] * since)
        apa = C["apa"]
        phi = beta + apa[0] * np.sin(2 * beta) + apa[1] * np.sin(4 * beta) + apa[2] * np.sin(6 * beta)
    return np.degrees(mod_pi(lam + C["lambda0"])), np.degrees(phi)

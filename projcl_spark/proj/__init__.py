"""Projection registry + plan-time dispatch.

Replaces the reference's kernel-name dispatch
(``pl_find_projection_kernel``, ``src/projcl_run.c:256-264``: name scheme
``pl_[un]project_<name>_<s|e>``) with an ordinary dict, and applies the
degenerate-LCC → Mercator plan rewrite (``src/projcl_project.c:99-109``)
before any executor sees the data — parameters are literals at plan time, so
no Catalyst rule is needed.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from ..core.params import ProjectionParams, lcc_is_pathological, mercator_params_from_pathological_lcc
from . import albers, laea, lcc, mercator, polyconic, robinson, stereographic, transverse_mercator, winkel

_MODULES = {
    "mercator": mercator,
    "albers_equal_area": albers,
    "lambert_conformal_conic": lcc,
    "lambert_azimuthal_equal_area": laea,
    "american_polyconic": polyconic,
    "oblique_stereographic": stereographic,
    "robinson": robinson,
    "transverse_mercator": transverse_mercator,
    "winkel_tripel": winkel,
}

PROJECTIONS = tuple(_MODULES)

# Projections the reference implements only for the sphere
SPHERICAL_ONLY = ("robinson", "winkel_tripel")


def resolve(proj: str, params: ProjectionParams) -> tuple[str, ProjectionParams]:
    """Plan-time rewrites; returns the physical (proj, params)."""
    if proj == "lambert_conformal_conic" and lcc_is_pathological(params):
        return "mercator", mercator_params_from_pathological_lcc(params)
    return proj, params


def get_transform(
    proj: str, params: ProjectionParams, direction: str = "forward",
    dtype=np.float64,
) -> Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]:
    """Pure-numpy (a, b) -> (c, d) transform with constants folded in.

    ``direction``: ``forward`` (lon,lat → x,y meters) or ``inverse``.
    Constants are precomputed here, once, on the driver, in float64 —
    mirroring the reference's host precompute stage.

    ``dtype=np.float32`` is the like-for-like parity mode: inputs are
    downcast so the vector math runs single-precision, reproducing the
    reference's accuracy envelope (≤10 m projected / ≤1″ geodetic,
    ``README.md:20-28``); float64 is the default and strictly better.
    """
    proj, params = resolve(proj, params)
    if proj not in _MODULES:
        raise KeyError(f"unknown projection {proj!r}; have {PROJECTIONS}")
    mod = _MODULES[proj]
    consts = mod.prepare(params)
    fn = mod.forward if direction == "forward" else mod.inverse
    if direction not in ("forward", "inverse"):
        raise ValueError(f"direction must be forward|inverse, got {direction!r}")

    def transform(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        a = np.asarray(a, dtype=dtype)
        b = np.asarray(b, dtype=dtype)
        c, d = fn(a, b, consts)
        return np.asarray(c, dtype=np.float64), np.asarray(d, dtype=np.float64)

    return transform

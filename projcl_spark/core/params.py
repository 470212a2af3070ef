"""Projection parameters — typed, validated at plan time.

Mirrors ``PLProjectionParams`` (``/root/reference/include/projcl/
projcl_types.h:127-137`` + setters ``src/projcl_params.c:7-50``): a plain
POD of ``k0, x0, y0, lon0, lat0, rlat1, rlat2, spheroid``.  Frozen so it is
safe to capture in a pandas-UDF closure (pickled once per task).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

from .spheroid import Spheroid, SpheroidInfo, get_spheroid_info


@dataclass(frozen=True)
class ProjectionParams:
    spheroid: Spheroid = Spheroid.SPHERE
    scale: float = 1.0  # k0
    x0: float = 0.0  # false easting (m)
    y0: float = 0.0  # false northing (m)
    lon0: float = 0.0  # central meridian (deg)
    lat0: float = 0.0  # latitude of origin (deg)
    rlat1: float = math.nan  # standard parallel 1 (deg)
    rlat2: float = math.nan  # standard parallel 2 (deg)

    def info(self) -> SpheroidInfo:
        return get_spheroid_info(self.spheroid)

    def with_(self, **kw) -> "ProjectionParams":
        return replace(self, **kw)


def mercator_params_from_pathological_lcc(src: ProjectionParams) -> ProjectionParams:
    """Degenerate LCC (rlat1 == -rlat2) is a scaled Mercator.

    Plan-time rewrite mirroring
    ``pl_params_set_mercator_params_from_pathological_lambert_conformal_conic_params``
    (``src/projcl_params.c:52-61``) and the dispatch rule
    ``src/projcl_project.c:99-109``.
    """
    info = src.info()
    cosphi1 = math.cos(math.radians(src.rlat1))
    base = src.scale * info.major_axis * cosphi1
    return ProjectionParams(
        spheroid=src.spheroid,
        scale=src.scale * cosphi1,
        x0=src.x0 - base * math.radians(src.lon0),
        y0=src.y0 - base * math.asinh(math.tan(math.radians(src.lat0))),
    )


def lcc_is_pathological(p: ProjectionParams) -> bool:
    """Symmetric standard parallels collapse the cone (n → 0)."""
    return (
        not math.isnan(p.rlat1)
        and not math.isnan(p.rlat2)
        and abs(p.rlat1 + p.rlat2) < 1e-9
        and abs(p.rlat1 - p.rlat2) > 1e-9
    )

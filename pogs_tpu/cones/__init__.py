"""Cone library: projections onto the 7 supported cones + cone sets."""

from pogs_tpu.cones.projections import (
    project_soc,
    project_sdp_packed,
    project_exp_primal,
    project_exp_dual,
)
from pogs_tpu.cones.sets import ConeSet, dual_cone, validate_cones

__all__ = [
    "project_soc",
    "project_sdp_packed",
    "project_exp_primal",
    "project_exp_dual",
    "ConeSet",
    "dual_cone",
    "validate_cones",
]

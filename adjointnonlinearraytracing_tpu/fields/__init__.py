from .grid import (
    GridField,
    eval_grad,
    eval_hess,
    hess_matvec,
    splat,
    splat_delta,
    inbounds,
    escaped,
    upres_volume,
)
from .cylinder import (
    CylinderField,
    cyl_eval_grad,
    cyl_eval_hess,
    cyl_hess_matvec,
    cyl_splat_delta,
    cyl_inbounds,
    cyl_escaped,
    upres_profile,
    upres_profile_midpoint,
)
from .rbf import RbfGrid, rbf_tent, rbf_cubic

__all__ = [
    "GridField", "eval_grad", "eval_hess", "hess_matvec", "splat",
    "splat_delta", "inbounds", "escaped", "upres_volume",
    "CylinderField", "cyl_eval_grad", "cyl_eval_hess", "cyl_hess_matvec",
    "cyl_splat_delta", "cyl_inbounds", "cyl_escaped", "upres_profile",
    "upres_profile_midpoint",
    "RbfGrid", "rbf_tent", "rbf_cubic",
]

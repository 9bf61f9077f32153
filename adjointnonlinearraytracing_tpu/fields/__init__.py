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
from .rbf import RbfGrid, rbf_tent, rbf_cubic, render_gradient
from .cells import CellField, build_cell_table
from .sdf_utils import get_pts_sdf, get_opp_pts
from .cylinder import cyl_render, cyl_render2

__all__ = [
    "GridField", "eval_grad", "eval_hess", "hess_matvec", "splat",
    "splat_delta", "inbounds", "escaped", "upres_volume",
    "CylinderField", "cyl_eval_grad", "cyl_eval_hess", "cyl_hess_matvec",
    "cyl_splat_delta", "cyl_inbounds", "cyl_escaped", "upres_profile",
    "upres_profile_midpoint",
    "RbfGrid", "rbf_tent", "rbf_cubic",
]

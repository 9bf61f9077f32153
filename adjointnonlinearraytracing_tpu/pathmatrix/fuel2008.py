"""Classical fuel-injection reconstruction baseline (Atcheson et al. 2008).

Twin of /root/reference/path_matrix/run_fuel_injection_2008.py: trace
ground-truth rays through the volume with the *nonlinear* JAX tracer, clip
entry/exit to the cube, build the linear path matrix Phi, solve per-axis
LSQR for the index-gradient fields from ray deflections, then Poisson-
integrate under Dirichlet boundary conditions — a completely independent
reconstruction method used to cross-check the adjoint tracer, with timing and
memory reporting.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracer
from ..sources import sources as S
from . import path_matrix as PM


def intersect_cube(x, v, lo, hi):
    """Ray-box slab intersection: returns (t_entry, t_exit) per ray."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (lo - x) / v
        t2 = (hi - x) / v
    tmin = np.minimum(t1, t2)
    tmax = np.maximum(t1, t2)
    tmin[~np.isfinite(tmin)] = -np.inf
    tmax[~np.isfinite(tmax)] = np.inf
    return tmin.max(axis=1), tmax.min(axis=1)


def trace_to_cube(x, v, span):
    """Advance ray starts onto the cube entry face
    (run_fuel_injection_2008.py:20-47 behavior)."""
    t_in, t_out = intersect_cube(x, v, 0.0, span)
    t = np.clip(t_in, 0.0, None)
    hit = t_in <= t_out
    return x + t[:, None] * v, hit


def trace_back_to_cube(xt, vt, span):
    """Pull exit samples back onto the cube exit face (:49-64 behavior)."""
    # going backwards along vt from a point just outside: the first slab hit
    t_in, t_out = intersect_cube(xt, -vt, 0.0, span)
    t = np.clip(t_in, 0.0, None)
    return xt - t[:, None] * vt


def record_paths(gtruth, x, v, h, ds, stride=8):
    """Record per-ray trajectories every ``stride`` steps for the 'true'
    path-matrix mode (reference path_matrix.py true-path option,
    run_fuel_injection_2008.py:230-255 commented variants).

    Returns (path (nrec*N, 3) float32, nrec): path[k*N + i] is ray i's
    position after k*stride steps — the flattened layout
    :func:`path_matrix.get_true_path` indexes."""
    from jax import lax

    from ..fields import grid as G
    from ..fields.grid import GridField
    from ..tracer import eikonal as E

    field = GridField(gtruth, h)
    steps = E.max_steps_fwd(max(gtruth.shape), h, ds)
    nrec = steps // stride + 1
    dsx = jnp.asarray(ds, dtype=x.dtype)
    inside0 = G.inbounds(field, x)

    def outer(carry, _):
        x, v, inside = carry

        def inner(_, t):
            x, v, inside = t
            n, nx = G.eval_grad(field, x, inside)
            v2 = v + (dsx * n)[:, None] * nx
            x2 = x + dsx * v2
            return (x2, v2, G.inbounds(field, x2))

        x, v, inside = lax.fori_loop(0, stride, inner, (x, v, inside))
        return (x, v, inside), x

    (xf, vf, _), xs = lax.scan(outer, (x, v, inside0), None,
                               length=nrec - 1)
    path = jnp.concatenate([x[None], xs], axis=0)  # (nrec, N, 3)
    return np.asarray(path, dtype=np.float32).reshape(-1, 3), nrec


def fuel_reconstruction(gtruth: jnp.ndarray, params: Optional[Dict] = None):
    """Run the 2008 pipeline on a GT index volume.  Returns (recon, report).

    gtruth: (res, res, res) refractive-index field on span [0, vol_span].

    ``spline`` selects the path model (reference path_matrix.py:230-255):
    'linear' (2008 baseline), 'hermite' (entry/exit cubic), or 'true'
    (recorded trajectories, ``path_stride`` steps apart).  ``angle_span`` /
    ``sensor_dist_frac`` expose the reference driver's acquisition geometry
    (run_fuel_injection_2008.py:92: 180 deg half-circle, sensors at
    1.4*span)."""
    p = dict(
        vol_span=1.0,
        nviews=16,
        nbins=32,
        spp=4,
        step_res=2,
        recon_res=None,     # defaults to gt res - 1 voxels
        int_res=175,
        damp=0.0,           # gradient LSQR damp (reference: 0.000, :196)
        damp_int=1e-4,      # integration damp (reference: 0.0001, :210)
        spline="linear",
        path_stride=8,
        angle_span=360,
        sensor_dist_frac=1.0,
        seed=0,
    )
    if params:
        p.update(params)

    span = p["vol_span"]
    res = gtruth.shape[0]
    h = span / (res - 1)
    ds = h / p["step_res"]
    recon_res = p["recon_res"] or (res - 1)

    report = {}
    t0 = time.time()

    # 1) GT rays traced with the nonlinear tracer (forward only)
    rays, _ = S.rand_rays_in_sphere(
        jax.random.PRNGKey(p["seed"]), p["nviews"], (p["nbins"], p["nbins"]),
        p["spp"], span, circle=False, angle_span=p["angle_span"],
        sensor_dist=p["sensor_dist_frac"] * span)
    x0 = np.asarray(rays.x, dtype=np.float64)
    v0 = np.asarray(rays.v, dtype=np.float64)
    xt, vt = tracer.trace(gtruth, rays.x, rays.v, h, ds)
    xt = np.asarray(xt, dtype=np.float64)
    vt = np.asarray(vt, dtype=np.float64)
    path_buf = None
    if p["spline"] == "true":
        pb, nrec = record_paths(gtruth, rays.x, rays.v, h, ds,
                                p["path_stride"])
        path_buf = (pb, nrec)
    report["trace_time"] = time.time() - t0

    # normalize: the tracer's |v| grows with n; deflection compares directions
    v0n = v0 / np.linalg.norm(v0, axis=1, keepdims=True)
    vtn = vt / np.linalg.norm(vt, axis=1, keepdims=True)

    # 2) clip to the cube; drop rays that missed or didn't deflect sanely
    sp_, hit = trace_to_cube(x0, v0n, span)
    ep_ = trace_back_to_cube(xt, vtn, span)
    good = hit & np.all(np.isfinite(sp_), 1) & np.all(np.isfinite(ep_), 1)
    good &= np.linalg.norm(ep_ - sp_, axis=1) > 1e-6
    sp_, ep_ = sp_[good], ep_[good]
    dv = (vtn - v0n)[good]
    report["num_rays"] = int(good.sum())

    # 3) path matrix (linear / hermite / recorded paths)
    t1 = time.time()
    path_arg = None
    if path_buf is not None:
        pb, nrec = path_buf
        n_all = len(good)
        # per-ray first/last recorded sample inside the cube
        pts = pb.reshape(nrec, n_all, 3)
        inside = np.all((pts >= 0) & (pts <= span), axis=-1)  # (nrec, N)
        any_in = inside.any(axis=0)
        first = np.argmax(inside, axis=0)
        last = nrec - 1 - np.argmax(inside[::-1], axis=0)
        first = np.where(any_in, first, 0)
        last = np.where(any_in, np.maximum(last, first), 0)
        # reindex the flattened buffer to the kept rays
        keep = np.where(good)[0]
        pb_kept = pts[:, keep, :].reshape(-1, 3).astype(np.float64)
        path_arg = (pb_kept, first[keep].astype(float),
                    last[keep].astype(float))
    phi = PM.construct_voxel_matrix(sp_, v0n[good], ep_, vtn[good],
                                    span, recon_res, spline=p["spline"],
                                    int_res=p["int_res"], path=path_arg)
    report["phi_time"] = time.time() - t1
    report["phi_nnz"] = int(phi.nnz)

    # 4) per-axis gradient solve + Poisson integration
    t2 = time.time()
    import os as _os
    _gdump = _os.environ.get("F2008_GRAD_DUMP")
    if _gdump and _os.path.exists(_gdump):
        # reuse a previous run's LSQR solutions (the long step) when only
        # the integration stage changed; only gradients[i][0] is consumed
        z = np.load(_gdump)
        grads = [(z[f"g{i}"],) for i in range(3)]
    else:
        grads = PM.deflection_solve_gradient(phi, dv, damp=p["damp"])
        if _gdump:
            np.savez(_gdump, **{f"g{i}": np.asarray(grads[i][0])
                                for i in range(3)})
    report["solve_time"] = time.time() - t2

    t3 = time.time()
    diff_mats = PM.construct_diff_matrices(recon_res, span, 3)
    background = float(np.asarray(gtruth[0, 0, 0]))
    constraints = PM.construct_boundary_conditions(recon_res, 3, background)
    sol = PM.gradient_integration(diff_mats, constraints, grads,
                                  damp=p["damp_int"])
    report["integration_time"] = time.time() - t3

    # flat voxel index is ix + iy*res + iz*res^2 -> F-order gives [ix,iy,iz];
    # transpose to the field layout [iz,iy,ix]
    recon = sol[0].reshape((recon_res,) * 3, order="F").transpose(2, 1, 0)

    # 5) error vs GT sampled at the voxel centers
    from ..fields.grid import GridField, eval_grad
    box = span / recon_res
    centers = (np.stack(np.meshgrid(*([np.arange(recon_res)] * 3),
                                    indexing="ij"), axis=-1)
               .reshape(-1, 3)[:, ::-1] + 0.5) * box  # (N, 3) as (x, y, z)
    gt_vals, _ = eval_grad(GridField(gtruth, h), jnp.asarray(centers))
    gt_np = np.asarray(gt_vals).reshape((recon_res,) * 3)
    err = recon - gt_np
    denom = np.linalg.norm(gt_np.ravel() - background) or 1.0
    report["rel_err_norm"] = float(np.linalg.norm(err.ravel()) / denom)
    report["max_err"] = float(np.abs(err).max())
    report["l1_err"] = float(np.abs(err).mean())
    report["total_time"] = time.time() - t0
    try:
        import psutil
        rss = psutil.Process().memory_info().rss
        report["rss_mb"] = rss / 1e6
    except Exception:
        pass
    return recon, report


if __name__ == "__main__":
    from ..experiments import voxel_scenes

    gt = voxel_scenes.fuel_injection_rif().astype(jnp.float64)
    recon, rep = fuel_reconstruction(gt, dict(nviews=32, nbins=64, spp=4))
    for k, v in rep.items():
        print(f"{k}: {v}")

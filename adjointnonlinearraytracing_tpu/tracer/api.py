"""Differentiable tracing API: custom_vjp wrappers over the adjoint sweeps.

This is the analog of the reference's torch.autograd bridge
(/root/reference/core/tracer.py): each `Back*TracerC` class becomes one
`jax.custom_vjp` function whose backward pass is the constant-memory adjoint
re-integration, and each `AD*TracerC` (enoki-tape) class becomes the same
forward differentiated straight through a `lax.scan` (`*_ad` functions) for
cross-validation.

Gradient contract (matches core/tracer.py:318-335 etc.): only the field data
receives a gradient; ray inputs, planes/targets, and step sizes get zero
cotangents.  `h` and `ds` are static Python floats (non-differentiable, like
the reference).  `trace_plane`'s backward zeroes the position cotangent of
rays that missed the plane (core/tracer.py:366-371).

Precision note: the constant-memory adjoint re-integrates trajectories in
reverse; at float32 the reconstruction drifts on *rough* (high-curvature)
index fields and gradient error grows with field roughness (smooth physical
fields stay within ~0.1% of autodiff; a 10%-noise random field can deviate
tens of percent — the f32 CUDA reference behaves identically).  Use float64
inputs or the `*_ad` tape variants when optimizing non-smooth fields.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..fields.grid import GridField
from ..fields.cylinder import CylinderField
from ..fields import windows as WD
from . import eikonal as E
from . import fast as F
from . import paired as PD


def _check_rays(x, v, name="trace"):
    if x.ndim != 2 or x.shape[-1] != 3:
        raise ValueError(f"{name}: x must be (N, 3), got {x.shape}")
    if v.shape != x.shape:
        raise ValueError(f"{name}: v{v.shape} must match x{x.shape}")


def _check_rif(rif, name="trace"):
    if rif.ndim != 3:
        raise ValueError(
            f"{name}: rif must be a 3D voxel grid, got shape {rif.shape}")


def _check_per_ray3(arr, x, label, name):
    """A per-ray 3-vector input: (N, 3) matching x, or broadcastable (1, 3)/(3,)."""
    if arr.shape[-1] != 3 or arr.ndim > 2:
        raise ValueError(
            f"{name}: {label} must be (N, 3) or (3,), got {arr.shape}")
    if arr.ndim == 2 and arr.shape[0] not in (1, x.shape[0]):
        raise ValueError(
            f"{name}: {label} has {arr.shape[0]} rows but x has "
            f"{x.shape[0]} rays")


def _bcast_per_ray3(arr, x):
    """Normalize an accepted (3,) / (1,3) per-ray vector to (N, 3).

    The steppers and the zero cotangents both assume (N, 3); broadcasting at
    the API boundary (and returning zeros shaped like the ORIGINAL arg from
    the bwd rules) makes the documented shapes actually work under jax.grad
    (ADVICE r4)."""
    a = arr[None] if arr.ndim == 1 else arr
    if a.shape[0] != x.shape[0]:
        a = jnp.broadcast_to(a, x.shape)
    return a


def _grid(rif, h):
    return GridField(rif, h)


def _impl(rif, h, ds):
    """Static fast-path selection: paired window stepper vs classic cell table.

    The paired stepper (tracer/paired.py) needs per-step movement
    ``ds * n <= h``.  When ``rif`` is a concrete array (eager call) we gate
    on its actual max; under jit (``rif`` is a tracer) we use the assumed
    index bound ANRT_NMAX (default 2 — the physical worst case; every
    reference experiment satisfies it with peak index sqrt(2)).  A run
    whose field is known to stay lower can assert it — e.g. fuel-injection
    fields peak at ~1.0003, so ANRT_NMAX=1.001 keeps the paired fast path
    at ds up to ~h (the reference's own step-size envelope,
    src/test.cpp:148-177; accuracy quantified in benchmarks/ds_study.py).
    A jitted run whose field grows past the asserted bound violates the
    window precondition mid-flight; fields/windows.eval_window NaN-poisons
    those rays by default (ANRT_CHECK_WINDOW) so this fails loudly rather
    than silently — the classic path stays exact for such fields
    (ANRT_FAST_PATH=classic).

    The window table costs 64 floats per extended cell, so huge grids fall
    back to the classic path.  Env overrides: ANRT_FAST_PATH=paired|classic|
    auto, ANRT_NMAX (default 2), ANRT_WINDOW_MEM_MB (default 6144).
    """
    mode = os.environ.get("ANRT_FAST_PATH", "auto")
    if mode == "classic":
        return F
    if mode == "paired":
        return PD
    if isinstance(rif, jax.core.Tracer):
        nmax_assumed = float(os.environ.get("ANRT_NMAX", "2"))
        if float(ds) * nmax_assumed > float(h) * (1 + 1e-12):
            return F
    else:
        nmax = max(float(jnp.max(rif)), 1.0)
        if float(ds) * nmax > float(h) * (1 + 1e-12):
            return F
    limit = int(os.environ.get("ANRT_WINDOW_MEM_MB", "6144")) << 20
    if WD.window_bytes(rif.shape, rif.dtype.itemsize) > limit:
        return F
    return PD


def _steps_fwd(rif, h, ds):
    return E.max_steps_fwd(max(rif.shape), h, ds)


def _steps_bwd(rif, h, ds):
    return E.max_steps_bwd(max(rif.shape), h, ds)


# ---------------------------------------------------------------------------
# trace — BackTracerC analog
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def trace(rif, x, v, h, ds):
    """Differentiable volume trace.  rif: (D,H,W) voxel grid; x, v: (N,3).

    Returns exit state (xt, vt).  d(loss)/d(rif) is computed by the
    constant-memory adjoint (BackTracerC, core/tracer.py:294-335).
    """
    _check_rif(rif); _check_rays(x, v)
    return _impl(rif, h, ds).trace(_grid(rif, h), x, v, ds,
                                    _steps_fwd(rif, h, ds))


def _trace_fwd(rif, x, v, h, ds):
    out = _impl(rif, h, ds).trace(_grid(rif, h), x, v, ds,
                                  _steps_fwd(rif, h, ds))
    return out, (rif, out[0], out[1])


def _trace_bwd(h, ds, res, cts):
    rif, xt, vt = res
    dxt, dvt = cts
    g = _impl(rif, h, ds).backtrace(_grid(rif, h), xt, vt, dxt, dvt, ds,
                                    _steps_bwd(rif, h, ds))
    return g.reshape(rif.shape), jnp.zeros_like(xt), jnp.zeros_like(vt)


trace.defvjp(_trace_fwd, _trace_bwd)


# ---------------------------------------------------------------------------
# trace_plane — BackPlaneTracerC analog
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def trace_plane(rif, x, v, pln_o, pln_d, h, ds):
    """Trace terminating past the per-ray plane; returns (xt, vt, miss).

    ``miss`` marks rays that never exited; their position cotangent is zeroed
    in the backward pass (core/tracer.py:366-371).
    """
    _check_rif(rif, "trace_plane"); _check_rays(x, v, "trace_plane")
    _check_per_ray3(pln_o, x, "pln_o", "trace_plane")
    _check_per_ray3(pln_d, x, "pln_d", "trace_plane")
    return _impl(rif, h, ds).trace_plane(
        _grid(rif, h), x, v, _bcast_per_ray3(pln_o, x),
        _bcast_per_ray3(pln_d, x), ds, _steps_fwd(rif, h, ds))


def _trace_plane_fwd(rif, x, v, pln_o, pln_d, h, ds):
    out = _impl(rif, h, ds).trace_plane(
        _grid(rif, h), x, v, _bcast_per_ray3(pln_o, x),
        _bcast_per_ray3(pln_d, x), ds, _steps_fwd(rif, h, ds))
    xt, vt, miss = out
    return out, (rif, xt, vt, miss, pln_o, pln_d)


def _trace_plane_bwd(h, ds, res, cts):
    rif, xt, vt, miss, pln_o, pln_d = res
    dxt, dvt, _ = cts
    dxt = jnp.where(miss[:, None], 0.0, dxt)
    g = _impl(rif, h, ds).backtrace(_grid(rif, h), xt, vt, dxt, dvt, ds,
                                    _steps_bwd(rif, h, ds))
    zeros3 = jnp.zeros_like(xt)
    return (g.reshape(rif.shape), zeros3, zeros3,
            jnp.zeros_like(pln_o), jnp.zeros_like(pln_d))


trace_plane.defvjp(_trace_plane_fwd, _trace_plane_bwd)


# ---------------------------------------------------------------------------
# trace_target — BackTargetTracerC analog
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def trace_target(rif, x, v, target, h, ds):
    """Trace recording closest approach to per-ray targets; returns
    (xt, vt, dist2).  dist2 carries no gradient (core/tracer.py:415-432)."""
    _check_rif(rif, "trace_target"); _check_rays(x, v, "trace_target")
    _check_per_ray3(target, x, "target", "trace_target")
    return _impl(rif, h, ds).trace_target(
        _grid(rif, h), x, v, _bcast_per_ray3(target, x), ds,
        _steps_fwd(rif, h, ds))


def _trace_target_fwd(rif, x, v, target, h, ds):
    out = _impl(rif, h, ds).trace_target(
        _grid(rif, h), x, v, _bcast_per_ray3(target, x), ds,
        _steps_fwd(rif, h, ds))
    xt, vt, d2 = out
    return out, (rif, xt, vt, target)


def _trace_target_bwd(h, ds, res, cts):
    rif, xt, vt, target = res
    dxt, dvt, _ = cts
    g = _impl(rif, h, ds).backtrace(_grid(rif, h), xt, vt, dxt, dvt, ds,
                                    _steps_bwd(rif, h, ds))
    zeros3 = jnp.zeros_like(xt)
    return g.reshape(rif.shape), zeros3, zeros3, jnp.zeros_like(target)


trace_target.defvjp(_trace_target_fwd, _trace_target_bwd)


# ---------------------------------------------------------------------------
# trace_sdf — BackSDFTracerC analog
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def trace_sdf(rif, sdf, x, v, h, ds):
    """Trace where the medium interior is sdf < 0; returns (xt, vt).

    Only rif receives a gradient; the sdf grid cotangent is zero
    (core/tracer.py:461-479)."""
    _check_rif(rif, "trace_sdf"); _check_rays(x, v, "trace_sdf")
    if sdf.shape != rif.shape:
        raise ValueError(
            f"trace_sdf: sdf grid {sdf.shape} must match rif {rif.shape}")
    steps = int(2.0 * h * max(rif.shape) / ds)  # tracer.cpp:262
    return _impl(rif, h, ds).trace_sdf(_grid(rif, h), _grid(sdf, h), x, v,
                                       ds, steps)


def _trace_sdf_fwd(rif, sdf, x, v, h, ds):
    steps = int(2.0 * h * max(rif.shape) / ds)
    out = _impl(rif, h, ds).trace_sdf(_grid(rif, h), _grid(sdf, h), x, v,
                                      ds, steps)
    return out, (rif, sdf, out[0], out[1])


def _trace_sdf_bwd(h, ds, res, cts):
    rif, sdf, xt, vt = res
    dxt, dvt = cts
    g = _impl(rif, h, ds).backtrace_sdf(_grid(rif, h), _grid(sdf, h), xt, vt,
                                        dxt, dvt, ds, _steps_bwd(rif, h, ds))
    zeros3 = jnp.zeros_like(xt)
    return g.reshape(rif.shape), jnp.zeros_like(sdf), zeros3, zeros3


trace_sdf.defvjp(_trace_sdf_fwd, _trace_sdf_bwd)


# ---------------------------------------------------------------------------
# trace_cable — BackCableTracerC analog
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 6))
def trace_cable(rif, radius, length, x, v, target, ds):
    """Cylinder-volume trace; rif is the 1D radial profile.  Returns
    (xt, vt, dist2) (core/tracer.py:482-527)."""
    if rif.ndim != 1:
        raise ValueError(
            f"trace_cable: rif must be a 1D radial profile, got {rif.shape}")
    _check_rays(x, v, "trace_cable")
    _check_per_ray3(target, x, "target", "trace_cable")
    steps = int(4.0 * length / ds)  # tracer.cpp:332
    return E.trace_cable(CylinderField(rif, radius, length), x, v,
                         _bcast_per_ray3(target, x), ds, steps)


def _trace_cable_fwd(rif, radius, length, x, v, target, ds):
    steps = int(4.0 * length / ds)
    out = E.trace_cable(CylinderField(rif, radius, length), x, v,
                        _bcast_per_ray3(target, x), ds, steps)
    return out, (rif, out[0], out[1], target)


def _trace_cable_bwd(radius, length, ds, res, cts):
    rif, xt, vt, target = res
    dxt, dvt, _ = cts
    steps = int(4.0 * length / ds)  # tracer.cpp:544
    g = E.backtrace_cable(CylinderField(rif, radius, length), xt, vt,
                          dxt, dvt, ds, steps)
    zeros3 = jnp.zeros_like(xt)
    return g, zeros3, zeros3, jnp.zeros_like(target)


trace_cable.defvjp(_trace_cable_fwd, _trace_cable_bwd)


# ---------------------------------------------------------------------------
# Autodiff-tape analogs (debug / cross-validation)
# ---------------------------------------------------------------------------

def trace_ad(rif, x, v, h, ds):
    """ADTracerC analog: the same forward, differentiable with plain jax.grad
    through `lax.scan` (O(steps) memory).  Used to validate `trace`'s adjoint."""
    return E.trace_scan(_grid(rif, h), x, v, ds, _steps_fwd(rif, h, ds))


def trace_plane_ad(rif, x, v, pln_o, pln_d, h, ds):
    """ADPlaneTracerC analog: plane trace differentiable via plain autodiff."""
    return E.trace_plane_scan(_grid(rif, h), x, v, pln_o, pln_d, ds,
                              _steps_fwd(rif, h, ds))


def trace_target_ad(rif, x, v, target, h, ds):
    """Scan-autodiff target trace (no reference AD analog exists; used to
    cross-validate trace_target_exact)."""
    return E.trace_target_scan(_grid(rif, h), x, v, target, ds,
                               _steps_fwd(rif, h, ds))


def trace_sdf_ad(rif, sdf, x, v, h, ds):
    """ADSDFTracerC analog."""
    steps = int(2.0 * h * max(rif.shape) / ds)
    return E.trace_sdf_scan(_grid(rif, h), _grid(sdf, h), x, v, ds, steps)


def trace_cable_ad(rif, radius, length, x, v, target, ds):
    """ADCableTracerC analog."""
    steps = int(4.0 * length / ds)
    return E.trace_cable_scan(CylinderField(rif, radius, length), x, v,
                              target, ds, steps)

"""Eikonal ODE integrators: forward steppers and constant-memory adjoints.

The physics: rays follow ``dx/ds = v, dv/ds = n * grad(n)`` (an arc-length-like
parameterization with |v| = n), integrated with fixed-step symplectic Euler —
``v += ds * n * grad_n;  x += ds * v`` — over a refractive-index field, with
per-ray active masks and exit-state capture at the inside->outside crossing.
Semantics mirror /root/reference/src/tracer.cpp (trace: 35-100, trace_plane:
102-172, trace_target: 174-242, trace_sdf: 244-310, trace_cable: 312-382,
backtrace*: 384-567), re-designed for XLA: `lax.while_loop` with early exit
when every ray has escaped, static shapes, mask-based lane control.

The backward passes are the *constant-memory adjoint*: starting from the exit
state and the loss cotangents ``(dx, dv)``, re-integrate the ray in reverse
while evolving adjoint variables ``la = dx``, ``mu = dv + ds*dx`` and
scatter-adding per-step contributions ``(mu . grad_n) * B_i + n * mu . dB_i``
into the voxel-gradient grid.  Memory is O(1) in step count — this is the
property that replaces the O(steps) autodiff tape.

All functions are jit/shard_map friendly; under `shard_map` the all-escaped
early-exit reduction is per-shard, which is exactly what you want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import grid as G
from ..fields import cylinder as C


def max_steps_fwd(res_max: int, h: float, ds: float) -> int:
    """Forward step bound: int(4 * h * max(res) / ds) (tracer.cpp:51)."""
    return int(4.0 * h * res_max / ds)


def max_steps_bwd(res_max: int, h: float, ds: float) -> int:
    """Backward step bound: int(2 * h * max(res) / ds) (tracer.cpp:417)."""
    return int(2.0 * h * res_max / ds)


def _where3(m, a, b):
    return jnp.where(m[:, None], a, b)


# ---------------------------------------------------------------------------
# Forward integrators
# ---------------------------------------------------------------------------

def trace(field: G.GridField, x0, v0, ds, max_steps: int):
    """Basic volume trace; returns exit state (xt, vt) (tracer.cpp:35-100)."""
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        cur_inside = G.inbounds(field, x)
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (step + 1, x, v, xt, vt, cur_inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))

    # rays that never exited report their final position (tracer.cpp:89-96)
    xt = _where3(esc, xt, x)
    return xt, vt


def trace_plane(field: G.GridField, x0, v0, pln_o, pln_d, ds, max_steps: int):
    """Trace with extra past-the-plane termination (tracer.cpp:102-172).

    Returns (xt, vt, miss) where ``miss`` marks rays that never exited.
    """
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        past_pln = jnp.einsum("nd,nd->n", x - pln_o, pln_d) > 0
        cur_inside = G.inbounds(field, x) & ~past_pln
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (step + 1, x, v, xt, vt, cur_inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))

    xt = _where3(esc, xt, x)
    return xt, vt, ~esc


def trace_target(field: G.GridField, x0, v0, target, ds, max_steps: int):
    """Trace recording the closest approach to ``target`` (tracer.cpp:174-242).

    Returns (xt, vt, dist2) at the closest-approach step.
    """
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, d2, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        cur_d2 = jnp.sum((x - target) ** 2, axis=-1)
        closer = cur_d2 < d2

        cur_inside = G.inbounds(field, x)
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(closer, x, xt)
        vt = _where3(closer, v, vt)
        d2 = jnp.where(closer, cur_d2, d2)
        return (step + 1, x, v, xt, vt, d2, cur_inside, esc)

    _, x, v, xt, vt, d2, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, d20, inside0, esc0))
    # no failed-to-exit fixup for the target variant (tracer.cpp:236-239)
    return xt, vt, d2


def trace_sdf(field: G.GridField, sdf: G.GridField, x0, v0, ds, max_steps: int):
    """Trace where "inside" is defined by sdf < 0 (tracer.cpp:244-310)."""
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        dist, _ = G.eval_grad(sdf, x, inside)
        cur_inside = dist < 0
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (step + 1, x, v, xt, vt, cur_inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))
    # sdf variant does not fix up unfinished rays (tracer.cpp:304-306)
    return xt, vt


def trace_cable(field: C.CylinderField, x0, v0, target, ds, max_steps: int):
    """Cylinder-volume trace toward a target point (tracer.cpp:312-382).

    Only active (not-yet-escaped) lanes advance; returns closest-approach
    (xt, vt, dist2).
    """
    inside0 = C.cyl_inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    active0 = ~esc0
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, d2, inside, active, esc = s
        n, nx = C.cyl_eval_grad(field, x)
        vn = v + (ds * n)[:, None] * nx
        v = _where3(active, vn, v)
        x = _where3(active, x + ds * v, x)

        cur_d2 = jnp.sum((x - target) ** 2, axis=-1)
        closer = cur_d2 < d2

        cur_inside = C.cyl_inbounds(field, x)
        cross = inside & ~cur_inside
        esc = esc | cross | C.cyl_escaped(field, x, v)
        active = active & ~esc

        xt = _where3(closer, x, xt)
        vt = _where3(closer, v, vt)
        d2 = jnp.where(closer, cur_d2, d2)
        return (step + 1, x, v, xt, vt, d2, cur_inside, active, esc)

    _, x, v, xt, vt, d2, _, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, d20, inside0, active0, esc0))
    return xt, vt, d2


# ---------------------------------------------------------------------------
# Constant-memory adjoints
# ---------------------------------------------------------------------------

def backtrace(field: G.GridField, xt, vt, dx, dv, ds, max_steps: int,
              axis_name=None):
    """Adjoint reverse sweep; returns the flat voxel gradient
    (tracer.cpp:384-440).  Pass ``axis_name`` when called inside `shard_map`
    so the gradient carry is typed as device-varying."""
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    g0 = jnp.zeros((field.data.size,), dtype=field.data.dtype)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def cond(s):
        step, *_, active, _ = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, g = s
        x = x - ds * v
        # NOTE: eval/splat are masked by active & inbounds(x), not just active
        # as in the reference (tracer.cpp:421,432): the forward stepper's
        # evals are masked by inbounds (tracer.cpp:68), so including it here
        # makes the reverse sweep an exact inverse of the forward even for
        # rays that graze outside the grid mid-trajectory, and the adjoint
        # gradient matches the autodiff-tape gradient (see tests/test_tracer).
        # Positions are snapped back onto eps-drifted cell boundaries so that
        # forward evals that happened exactly on a boundary are reproduced
        # (fields.grid.snap_to_nodes).
        xe = G.snap_to_nodes(x, field.h)
        emask = active & G.inbounds(field, xe)
        n, nx = G.eval_grad(field, xe, emask)
        hess = G.eval_hess(field, xe, emask)
        v = v - (ds * n)[:, None] * nx

        active = active & ~G.escaped(field, xe, -v)

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        g = G.scatter_into(g, field, xe, dn * ds, dnx * ds, active & emask)

        la = la + ds * (dn[:, None] * nx + n[:, None] * G.hess_matvec(hess, mu))
        mu = mu + ds * la
        return (step + 1, x, v, la, mu, active, g)

    _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, g0))
    return g


def backtrace_sdf(field: G.GridField, sdf: G.GridField, xt, vt, dx, dv, ds,
                  max_steps: int, axis_name=None):
    """Adjoint sweep with sdf-crossing deactivation (tracer.cpp:443-509)."""
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    dist0, _ = G.eval_grad(sdf, xt, active0)
    outside0 = dist0 >= 0
    g0 = jnp.zeros((field.data.size,), dtype=field.data.dtype)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def cond(s):
        step, *_, active, _outside, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, outside, g = s
        x = x - ds * v
        xe = G.snap_to_nodes(x, field.h)
        emask = active & G.inbounds(field, xe)
        n, nx = G.eval_grad(field, xe, emask)
        hess = G.eval_hess(field, xe, emask)
        v = v - (ds * n)[:, None] * nx

        dist, _ = G.eval_grad(sdf, xe, active)
        active = active & ~G.escaped(field, xe, -v)
        cross = ~outside & (dist >= 0)
        active = active & ~cross
        outside = dist >= 0

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        g = G.scatter_into(g, field, xe, dn * ds, dnx * ds, active & emask)

        la = la + ds * (dn[:, None] * nx + n[:, None] * G.hess_matvec(hess, mu))
        mu = mu + ds * la
        return (step + 1, x, v, la, mu, active, outside, g)

    _, _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, outside0, g0))
    return g


def backtrace_cable(field: C.CylinderField, xt, vt, dx, dv, ds, max_steps: int,
                    axis_name=None):
    """Adjoint sweep through the cylinder volume; returns the radial-profile
    gradient (tracer.cpp:511-567)."""
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~C.cyl_escaped(field, xt, -vt)
    g0 = jnp.zeros_like(field.data)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def cond(s):
        step, *_, active, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, g = s
        x = x - ds * v
        # snap eps-drifted axial positions onto the cap planes (y = 0 and
        # y = length) so exact-on-cap forward evals are reproduced
        tol = 1e-9 if x.dtype == jnp.float64 else 1e-3
        ycap = jnp.where(jnp.abs(x[:, 1]) <= tol * field.radius, 0.0, x[:, 1])
        ycap = jnp.where(jnp.abs(ycap - field.length) <= tol * field.radius,
                         field.length, ycap)
        xe = x.at[:, 1].set(ycap)
        n, nx = C.cyl_eval_grad(field, xe, active)
        hess = C.cyl_eval_hess(field, xe, active)
        v = v - (ds * n)[:, None] * nx

        active = active & ~C.cyl_escaped(field, xe, -v)

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        g = g + C.cyl_splat_delta(field, xe, dn * ds, dnx * ds, active)

        la = la + ds * (dn[:, None] * nx + n[:, None] * C.cyl_hess_matvec(hess, mu))
        mu = mu + ds * la
        return (step + 1, x, v, la, mu, active, g)

    _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, g0))
    return g


# ---------------------------------------------------------------------------
# Scan-based differentiable forward (autodiff-tape analog, debug/validation)
# ---------------------------------------------------------------------------

def trace_scan(field: G.GridField, x0, v0, ds, max_steps: int):
    """Fixed-trip `lax.scan` forward, differentiable with plain `jax.grad`.

    This is the analog of the reference's enoki-tape path (ADTracerC,
    core/tracer.py:16-66): O(steps) memory, used to cross-validate the
    constant-memory adjoint. Produces the same (xt, vt) as :func:`trace`.
    """
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def body(s, _):
        x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        cur_inside = G.inbounds(field, x)
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (x, v, xt, vt, cur_inside, esc), None

    (x, v, xt, vt, _, esc), _ = lax.scan(
        body, (x0, v0, x0, v0, inside0, esc0), None, length=max_steps)
    xt = _where3(esc, xt, x)
    return xt, vt


def trace_plane_scan(field: G.GridField, x0, v0, pln_o, pln_d, ds,
                     max_steps: int):
    """Differentiable scan version of trace_plane (ADPlaneTracerC analog)."""
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def body(s, _):
        x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v
        past_pln = jnp.einsum("nd,nd->n", x - pln_o, pln_d) > 0
        cur_inside = G.inbounds(field, x) & ~past_pln
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)
        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (x, v, xt, vt, cur_inside, esc), None

    (x, v, xt, vt, _, esc), _ = lax.scan(
        body, (x0, v0, x0, v0, inside0, esc0), None, length=max_steps)
    xt = _where3(esc, xt, x)
    return xt, vt, ~esc


def trace_target_scan(field: G.GridField, x0, v0, target, ds, max_steps: int):
    """Differentiable scan version of trace_target.

    The reference has no AD target tracer (core/tracer.py covers Back only);
    this exists for gradient cross-validation of the exact/adjoint paths.
    Steps are gated on ``~all(escaped)`` so the ballistic closest-approach
    capture stops exactly where the while_loop forward stops.
    """
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def body(s, _):
        x, v, xt, vt, d2, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v2 = v + (ds * n)[:, None] * nx
        x2 = x + ds * v2
        cur_d2 = jnp.sum((x2 - target) ** 2, axis=-1)
        closer = cur_d2 < d2
        cur_inside = G.inbounds(field, x2)
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)
        run = ~jnp.all(esc)
        x2 = jnp.where(run, x2, x)
        v2 = jnp.where(run, v2, v)
        closer = closer & run
        cur_inside = jnp.where(run, cur_inside, inside)
        esc2 = jnp.where(run, esc2, esc)
        xt = _where3(closer, x2, xt)
        vt = _where3(closer, v2, vt)
        d2 = jnp.where(closer, cur_d2, d2)
        return (x2, v2, xt, vt, d2, cur_inside, esc2), None

    (x, v, xt, vt, d2, _, esc), _ = lax.scan(
        body, (x0, v0, x0, v0, d20, inside0, esc0), None, length=max_steps)
    return xt, vt, d2


def trace_sdf_scan(field: G.GridField, sdf: G.GridField, x0, v0, ds,
                   max_steps: int):
    """Differentiable scan version of trace_sdf (ADSDFTracerC analog)."""
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def body(s, _):
        x, v, xt, vt, inside, esc = s
        n, nx = G.eval_grad(field, x, inside)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v
        dist, _ = G.eval_grad(sdf, x, inside)
        cur_inside = dist < 0
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)
        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (x, v, xt, vt, cur_inside, esc), None

    (x, v, xt, vt, _, esc), _ = lax.scan(
        body, (x0, v0, x0, v0, inside0, esc0), None, length=max_steps)
    return xt, vt


def trace_cable_scan(field: C.CylinderField, x0, v0, target, ds,
                     max_steps: int):
    """Differentiable scan version of trace_cable (ADCableTracerC analog)."""
    inside0 = C.cyl_inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    active0 = ~esc0
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def body(s, _):
        x, v, xt, vt, d2, inside, active, esc = s
        n, nx = C.cyl_eval_grad(field, x)
        vn = v + (ds * n)[:, None] * nx
        v = _where3(active, vn, v)
        x = _where3(active, x + ds * v, x)
        cur_d2 = jnp.sum((x - target) ** 2, axis=-1)
        closer = cur_d2 < d2
        cur_inside = C.cyl_inbounds(field, x)
        cross = inside & ~cur_inside
        esc = esc | cross | C.cyl_escaped(field, x, v)
        active = active & ~esc
        xt = _where3(closer, x, xt)
        vt = _where3(closer, v, vt)
        d2 = jnp.where(closer, cur_d2, d2)
        return (x, v, xt, vt, d2, cur_inside, active, esc), None

    (x, v, xt, vt, d2, _, _, esc), _ = lax.scan(
        body, (x0, v0, x0, v0, d20, inside0, active0, esc0), None,
        length=max_steps)
    return xt, vt, d2

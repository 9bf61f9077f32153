"""Checkpointed-segment adjoint: exact gradients without reverse drift.

The constant-memory adjoint (eikonal/fast.backtrace) re-integrates the
trajectory in reverse.  That is O(1) memory in steps but numerically fragile:
at float32 the reconstructed path drifts on rough index fields and the
gradient degrades (the f32 CUDA reference behaves identically; see the
precision note in tracer/api.py).

This module implements the classic middle ground for EVERY trace variant
(plain / plane / target / sdf / cable — the reference's AD-tape coverage,
core/tracer.py:16-290): the forward stepper stores a checkpoint every ``seg``
steps plus each ray's capture step ``c`` (the step whose state became the
output), and the backward pass replays each segment FORWARD from its
checkpoint — so every adjoint update uses the *exact* forward positions —
while running the lambda/mu recursion in reverse across segments, gating all
updates on ``k < c``.  This computes the exact discrete gradient (== jax.grad
through the unrolled forward, at any precision) with
O(N * (max_steps/seg + seg)) memory instead of the tape's O(N * max_steps).

Variant unification: every variant's dynamics are the same symplectic step;
they differ only in (a) which mask gates the field eval (``inside``), (b) the
capture rule that records (xt, vt) and the capture step ``c``, and (c) lane
freezing (cable only).  The segment checkpoints therefore store
``(x, v, inside)`` — replaying a segment reproduces the forward bit-for-bit,
including ballistic (masked-eval) stretches, and the adjoint contribution at
step k is masked by the *same* ``inside_k`` the forward used.  Steps at or
past a ray's capture step are gated off; a masked step's adjoint update
degenerates to the exact ballistic transpose (la unchanged, mu += ds*la).

Memory at the north-star scale (128^3, 1032 fwd steps, 256k rays, seg=32):
~230 MB of checkpoints + ~200 MB replay buffer — comfortably in HBM where
the full tape would need ~6 GB of gathered residuals.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import cells as CT
from ..fields import cylinder as C
from ..fields import grid as G
from ..fields.cylinder import CylinderField
from ..fields.grid import GridField
from . import eikonal as E


def _where3(m, a, b):
    return jnp.where(m[:, None], a, b)


def _fetch(cf, x, mask):
    vals, w0, _ = CT.fetch(cf, x, mask)
    return vals, w0


# ---------------------------------------------------------------------------
# Volume variants: shared segmented forward + shared backward
# ---------------------------------------------------------------------------
#
# variant hooks (static python, resolved at trace time):
#   inside_update(x2, inside, esc)  -> cur_inside       (the next eval mask)
#   capture(x2, v2, inside, cur_inside, aux) -> (cap, aux2)
# aux is the per-ray capture auxiliary (d2 for target, None-placeholder
# otherwise).  esc always accumulates cross | escaped.


def _make_volume_variant(field, variant, sdf=None, pln_o=None, pln_d=None,
                         target=None):
    if variant == "plain":
        def inside_update(x2, inside, prev):
            return G.inbounds(field, x2)

        def capture(x2, v2, inside, cur_inside, aux):
            return inside & ~cur_inside, aux
    elif variant == "plane":
        def inside_update(x2, inside, prev):
            past = jnp.einsum("nd,nd->n", x2 - pln_o, pln_d) > 0
            return G.inbounds(field, x2) & ~past

        def capture(x2, v2, inside, cur_inside, aux):
            return inside & ~cur_inside, aux
    elif variant == "sdf":
        def inside_update(x2, inside, prev):
            dist, _ = G.eval_grad(sdf, x2, inside)
            return dist < 0

        def capture(x2, v2, inside, cur_inside, aux):
            return inside & ~cur_inside, aux
    elif variant == "target":
        def inside_update(x2, inside, prev):
            return G.inbounds(field, x2)

        def capture(x2, v2, inside, cur_inside, d2):
            d2n = jnp.sum((x2 - target) ** 2, axis=-1)
            cap = d2n < d2
            return cap, jnp.where(cap, d2n, d2)
    else:  # pragma: no cover
        raise ValueError(variant)
    return inside_update, capture


def _forward_with_ckpts(field: GridField, x0, v0, ds, max_steps: int, seg: int,
                        axis_name=None, variant="plain", **vargs):
    """Segmented forward; returns (xt, vt, esc, c, aux, ckpts).

    ckpts: (nseg, N, 7) — (x, v, inside) at each segment start.
    c:     (N,) int32 capture step — the step index whose post-step state was
           recorded as the output.  plain/plane: init max_steps (never-exit
           rays report the full trajectory); target/sdf: init 0 (never-
           captured rays return their untouched initial state -> zero grad).
    aux:   target variant's running closest distance^2 (else zeros).
    """
    cf = CT.build_cell_table(field)
    inside_update, capture = _make_volume_variant(field, variant, **vargs)
    nseg = -(-max_steps // seg)
    n = x0.shape[0]
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    if variant == "target":
        aux0 = jnp.sum((x0 - vargs["target"]) ** 2, axis=-1)
    else:
        aux0 = jnp.zeros((n,), dtype=x0.dtype)
    c0 = jnp.full((n,), max_steps if variant in ("plain", "plane") else 0,
                  dtype=jnp.int32)

    # the target variant keeps capturing ballistically after esc, so the
    # while_loop's stop-at-all-escaped is semantically visible; gate each
    # step on it for exact parity with eikonal.trace_target
    step_gated = variant == "target"

    def step(carry, k):
        x, v, xt, vt, inside, esc, c, aux = carry
        nv, nx = CT.eval_grad_from(*_fetch(cf, x, inside), field.h)
        v2 = v + (ds * nv)[:, None] * nx
        x2 = x + ds * v2
        cur_inside = inside_update(x2, inside, x)
        cap, aux2 = capture(x2, v2, inside, cur_inside, aux)
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)
        if step_gated:
            run = ~jnp.all(esc)
            x2 = jnp.where(run, x2, x)
            v2 = jnp.where(run, v2, v)
            cap = cap & run
            aux2 = jnp.where(run, aux2, aux)
            cur_inside = jnp.where(run, cur_inside, inside)
            esc2 = jnp.where(run, esc2, esc)
        xt2 = _where3(cap, x2, xt)
        vt2 = _where3(cap, v2, vt)
        c2 = jnp.where(cap, (k + 1).astype(jnp.int32), c)
        return (x2, v2, xt2, vt2, cur_inside, esc2, c2, aux2), None

    def segment(carry, s):
        x, v, xt, vt, inside, esc, c, aux = carry
        ck = jnp.concatenate(
            [x, v, inside.astype(x.dtype)[:, None]], axis=-1)  # (N, 7)

        def run(carry):
            def body(j, cr):
                cr2, _ = step(cr, s * seg + j)
                return cr2
            # the last segment may be partial: run exactly max_steps total
            nsteps = jnp.minimum(seg, max_steps - s * seg)
            return lax.fori_loop(0, nsteps, body, carry)

        carry2 = lax.cond(jnp.all(esc), lambda cr: cr, run, carry)
        return carry2, ck

    if axis_name is not None:
        c0 = lax.pcast(c0, axis_name, to="varying")
    init = (x0, v0, x0, v0, inside0, esc0, c0, aux0)
    (x, v, xt, vt, _, esc, c, aux), ckpts = lax.scan(
        segment, init, jnp.arange(nseg))
    if variant in ("plain", "plane"):
        # failed-to-exit fixup (tracer.cpp:89-96): report final position
        xt = _where3(esc, xt, x)
    return xt, vt, esc, c, aux, ckpts


def _backward_segments(field: GridField, ckpts, c, dx, dv, ds, max_steps: int,
                       seg: int, axis_name=None, variant="plain", **vargs):
    """Replay segments in reverse; exact lambda/mu recursion gated on k < c.

    The replay reproduces the forward's eval mask (``inside``) from the
    checkpointed bit and the variant's own recurrence, so contributions and
    the la/mu updates see exactly the forward's dynamics — including
    ballistic stretches, whose masked eval (nv = nx = hess = 0) degenerates
    the update to the exact ballistic transpose.
    """
    cf = CT.build_cell_table(field)
    inside_update, _ = _make_volume_variant(field, variant, **vargs)
    nseg = ckpts.shape[0]
    ds = jnp.asarray(ds, dtype=ckpts.dtype)

    la0 = dx
    mu0 = dv + ds * dx
    g0 = CT.zero_cell_grad(cf)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    max_c = jnp.max(c)

    def replay_segment(ck):
        """Forward (x_k, inside_k) for k in [s*seg, s*seg+seg) from ckpt."""
        x = ck[:, :3]
        v = ck[:, 3:6]
        inside = ck[:, 6] > 0.5

        def body(carry, _):
            x, v, inside = carry
            nv, nx = CT.eval_grad_from(*_fetch(cf, x, inside), field.h)
            v2 = v + (ds * nv)[:, None] * nx
            x2 = x + ds * v2
            cur_inside = inside_update(x2, inside, x)
            # emit the PRE-step position and its eval mask
            return (x2, v2, cur_inside), (x, inside)

        (_, _, _), (xs, ins) = lax.scan(body, (x, v, inside), None, length=seg)
        return xs, ins  # (seg, N, 3), (seg, N)

    def seg_bwd(carry, s):
        la, mu, g = carry

        def run(carry):
            la, mu, g = carry
            xs, ins = replay_segment(ckpts[s])

            def body(j, state):
                la, mu, g = state
                k = s * seg + j                      # global step index
                xk = xs[j]
                gate = k < c                         # contributes iff before capture
                emask = gate & ins[j]
                vals, w0, ci = CT.fetch(cf, xk, emask)
                nv, nx = CT.eval_grad_from(vals, w0, field.h)
                hess = CT.eval_hess_from(vals, w0, field.h)

                dn = jnp.einsum("nd,nd->n", mu, nx)
                dnx = nv[:, None] * mu
                contrib = CT.splat_rows(w0, dn * ds, dnx * ds, field.h,
                                        mask=emask)
                g = CT.scatter_rows(g, ci, contrib)

                la2 = la + ds * (dn[:, None] * nx
                                 + nv[:, None] * G.hess_matvec(hess, mu))
                mu2 = mu + ds * la2
                la = _where3(gate, la2, la)
                mu = _where3(gate, mu2, mu)
                return (la, mu, g)

            # reverse within the segment: j = seg-1 .. 0
            la, mu, g = lax.fori_loop(
                0, seg, lambda i, st: body(seg - 1 - i, st), (la, mu, g))
            return (la, mu, g)

        # skip segments entirely past every ray's capture step
        out = lax.cond(s * seg >= max_c, lambda cr: cr, run, (la, mu, g))
        return out, None

    (la, mu, g), _ = lax.scan(
        seg_bwd, (la0, mu0, g0), jnp.arange(nseg - 1, -1, -1))
    return CT.fold_cell_grad(g, cf).reshape(-1)


# ---------------------------------------------------------------------------
# trace_exact — plain volume trace
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def trace_exact(rif, x, v, h, ds, seg: int = 32):
    """Volume trace whose gradient is the exact discrete adjoint.

    Same forward semantics as :func:`tracer.trace`; the backward pass uses
    segment checkpoints + forward replay instead of reverse re-integration,
    so gradients match plain autodiff at machine precision at ANY dtype
    (including rough float32 fields where the O(1)-memory adjoint drifts).
    Memory: O(N * (steps/seg + seg)).
    """
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, _, _, _, _ = _forward_with_ckpts(field, x, v, ds, steps, seg)
    return xt, vt


def _trace_exact_fwd(rif, x, v, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, esc, c, _, ckpts = _forward_with_ckpts(field, x, v, ds, steps, seg)
    return (xt, vt), (rif, c, ckpts)


def _trace_exact_bwd(h, ds, seg, res, cts):
    rif, c, ckpts = res
    dxt, dvt = cts
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg)
    n = ckpts.shape[1]
    zeros3 = jnp.zeros((n, 3), dtype=ckpts.dtype)
    return g.reshape(rif.shape), zeros3, zeros3


trace_exact.defvjp(_trace_exact_fwd, _trace_exact_bwd)


# ---------------------------------------------------------------------------
# trace_plane_exact
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def trace_plane_exact(rif, x, v, pln_o, pln_d, h, ds, seg: int = 32):
    """Plane-terminated trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_plane` (returns (xt, vt, miss);
    missed rays' position cotangent is zeroed, core/tracer.py:366-371)."""
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, esc, _, _, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="plane", pln_o=pln_o, pln_d=pln_d)
    return xt, vt, ~esc


def _trace_plane_exact_fwd(rif, x, v, pln_o, pln_d, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, esc, c, _, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="plane", pln_o=pln_o, pln_d=pln_d)
    return (xt, vt, ~esc), (rif, pln_o, pln_d, c, ckpts, ~esc)


def _trace_plane_exact_bwd(h, ds, seg, res, cts):
    rif, pln_o, pln_d, c, ckpts, miss = res
    dxt, dvt, _ = cts
    dxt = jnp.where(miss[:, None], 0.0, dxt)
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                           variant="plane", pln_o=pln_o, pln_d=pln_d)
    n = ckpts.shape[1]
    zeros3 = jnp.zeros((n, 3), dtype=ckpts.dtype)
    return g.reshape(rif.shape), zeros3, zeros3, zeros3, zeros3


trace_plane_exact.defvjp(_trace_plane_exact_fwd, _trace_plane_exact_bwd)


# ---------------------------------------------------------------------------
# trace_target_exact
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def trace_target_exact(rif, x, v, target, h, ds, seg: int = 32):
    """Closest-approach trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_target` (returns (xt, vt, dist2);
    dist2 carries no gradient)."""
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, _, _, d2, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="target", target=target)
    return xt, vt, d2


def _trace_target_exact_fwd(rif, x, v, target, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    xt, vt, _, c, d2, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="target", target=target)
    return (xt, vt, d2), (rif, target, c, ckpts)


def _trace_target_exact_bwd(h, ds, seg, res, cts):
    rif, target, c, ckpts = res
    dxt, dvt, _ = cts
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                           variant="target", target=target)
    n = ckpts.shape[1]
    zeros3 = jnp.zeros((n, 3), dtype=ckpts.dtype)
    return g.reshape(rif.shape), zeros3, zeros3, zeros3


trace_target_exact.defvjp(_trace_target_exact_fwd, _trace_target_exact_bwd)


# ---------------------------------------------------------------------------
# trace_sdf_exact
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def trace_sdf_exact(rif, sdf, x, v, h, ds, seg: int = 32):
    """SDF-interior trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_sdf`; only rif receives a gradient
    (the sdf grid's cotangent is zero, core/tracer.py:461-479)."""
    field = GridField(rif, h)
    steps = int(2.0 * h * max(rif.shape) / ds)  # tracer.cpp:262
    xt, vt, _, _, _, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="sdf", sdf=GridField(sdf, h))
    return xt, vt


def _trace_sdf_exact_fwd(rif, sdf, x, v, h, ds, seg):
    field = GridField(rif, h)
    steps = int(2.0 * h * max(rif.shape) / ds)
    xt, vt, _, c, _, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="sdf", sdf=GridField(sdf, h))
    return (xt, vt), (rif, sdf, c, ckpts)


def _trace_sdf_exact_bwd(h, ds, seg, res, cts):
    rif, sdf, c, ckpts = res
    dxt, dvt = cts
    field = GridField(rif, h)
    steps = int(2.0 * h * max(rif.shape) / ds)
    g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                           variant="sdf", sdf=GridField(sdf, h))
    n = ckpts.shape[1]
    zeros3 = jnp.zeros((n, 3), dtype=ckpts.dtype)
    return g.reshape(rif.shape), jnp.zeros_like(sdf), zeros3, zeros3


trace_sdf_exact.defvjp(_trace_sdf_exact_fwd, _trace_sdf_exact_bwd)


# ---------------------------------------------------------------------------
# trace_cable_exact — cylinder volume (1D radial profile)
# ---------------------------------------------------------------------------
#
# The cable stepper freezes inactive lanes (x, v stop moving once escaped,
# tracer.cpp:312-382) and its eval is unmasked, so the checkpoint stores
# (x, v, esc); active == ~esc throughout (active only ever shrinks by esc).
# Capture (closest approach) cannot re-fire after a lane freezes (the
# distance stops changing), so k < c implies the lane was active at k.


def _fwd_ckpts_cable(field: CylinderField, x0, v0, target, ds, max_steps: int,
                     seg: int):
    nseg = -(-max_steps // seg)
    inside0 = C.cyl_inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)
    c0 = jnp.zeros((x0.shape[0],), dtype=jnp.int32)

    def step(carry, k):
        x, v, xt, vt, d2, inside, esc, c = carry
        active = ~esc
        n, nx = C.cyl_eval_grad(field, x)
        vn = v + (ds * n)[:, None] * nx
        v2 = _where3(active, vn, v)
        x2 = _where3(active, x + ds * v2, x)

        cur_d2 = jnp.sum((x2 - target) ** 2, axis=-1)
        closer = cur_d2 < d2

        cur_inside = C.cyl_inbounds(field, x2)
        cross = inside & ~cur_inside
        esc2 = esc | cross | C.cyl_escaped(field, x2, v2)

        xt2 = _where3(closer, x2, xt)
        vt2 = _where3(closer, v2, vt)
        d2b = jnp.where(closer, cur_d2, d2)
        c2 = jnp.where(closer, (k + 1).astype(jnp.int32), c)
        return (x2, v2, xt2, vt2, d2b, cur_inside, esc2, c2), None

    def segment(carry, s):
        x, v, xt, vt, d2, inside, esc, c = carry
        ck = jnp.concatenate(
            [x, v, esc.astype(x.dtype)[:, None]], axis=-1)  # (N, 7)

        def run(carry):
            def body(j, cr):
                cr2, _ = step(cr, s * seg + j)
                return cr2
            nsteps = jnp.minimum(seg, max_steps - s * seg)
            return lax.fori_loop(0, nsteps, body, carry)

        carry2 = lax.cond(jnp.all(esc), lambda cr: cr, run, carry)
        return carry2, ck

    init = (x0, v0, x0, v0, d20, inside0, esc0, c0)
    (x, v, xt, vt, d2, _, esc, c), ckpts = lax.scan(
        segment, init, jnp.arange(nseg))
    return xt, vt, d2, c, ckpts


def _bwd_segments_cable(field: CylinderField, ckpts, c, dx, dv, ds,
                        max_steps: int, seg: int):
    nseg = ckpts.shape[0]
    ds = jnp.asarray(ds, dtype=ckpts.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    g0 = jnp.zeros_like(field.data)
    max_c = jnp.max(c)

    def replay_segment(ck):
        x = ck[:, :3]
        v = ck[:, 3:6]
        esc = ck[:, 6] > 0.5

        def body(carry, _):
            x, v, esc = carry
            active = ~esc
            inside = C.cyl_inbounds(field, x)
            n, nx = C.cyl_eval_grad(field, x)
            vn = v + (ds * n)[:, None] * nx
            v2 = _where3(active, vn, v)
            x2 = _where3(active, x + ds * v2, x)
            cur_inside = C.cyl_inbounds(field, x2)
            cross = inside & ~cur_inside
            esc2 = esc | cross | C.cyl_escaped(field, x2, v2)
            return (x2, v2, esc2), (x, active)

        (_, _, _), (xs, act) = lax.scan(body, (x, v, esc), None, length=seg)
        return xs, act

    def seg_bwd(carry, s):
        la, mu, g = carry

        def run(carry):
            la, mu, g = carry
            xs, act = replay_segment(ckpts[s])

            def body(j, state):
                la, mu, g = state
                k = s * seg + j
                xk = xs[j]
                gate = (k < c) & act[j]
                n, nx = C.cyl_eval_grad(field, xk, gate)
                hess = C.cyl_eval_hess(field, xk, gate)

                dn = jnp.einsum("nd,nd->n", mu, nx)
                dnx = n[:, None] * mu
                g = g + C.cyl_splat_delta(field, xk, dn * ds, dnx * ds, gate)

                la2 = la + ds * (dn[:, None] * nx
                                 + n[:, None] * C.cyl_hess_matvec(hess, mu))
                mu2 = mu + ds * la2
                la = _where3(gate, la2, la)
                mu = _where3(gate, mu2, mu)
                return (la, mu, g)

            la, mu, g = lax.fori_loop(
                0, seg, lambda i, st: body(seg - 1 - i, st), (la, mu, g))
            return (la, mu, g)

        out = lax.cond(s * seg >= max_c, lambda cr: cr, run, (la, mu, g))
        return out, None

    (la, mu, g), _ = lax.scan(
        seg_bwd, (la0, mu0, g0), jnp.arange(nseg - 1, -1, -1))
    return g


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 6, 7))
def trace_cable_exact(rif, radius, length, x, v, target, ds, seg: int = 32):
    """Cylinder-volume trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_cable` (returns (xt, vt, dist2);
    only the 1D radial profile receives a gradient)."""
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)  # tracer.cpp:332
    xt, vt, d2, _, _ = _fwd_ckpts_cable(field, x, v, target, ds, steps, seg)
    return xt, vt, d2


def _trace_cable_exact_fwd(rif, radius, length, x, v, target, ds, seg):
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)
    xt, vt, d2, c, ckpts = _fwd_ckpts_cable(field, x, v, target, ds, steps,
                                            seg)
    return (xt, vt, d2), (rif, c, ckpts)


def _trace_cable_exact_bwd(radius, length, ds, seg, res, cts):
    rif, c, ckpts = res
    dxt, dvt, _ = cts
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)
    g = _bwd_segments_cable(field, ckpts, c, dxt, dvt, ds, steps, seg)
    n = ckpts.shape[1]
    zeros3 = jnp.zeros((n, 3), dtype=ckpts.dtype)
    return g, zeros3, zeros3, zeros3


trace_cable_exact.defvjp(_trace_cable_exact_fwd, _trace_cable_exact_bwd)

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

import os
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
                        axis_name=None, variant="plain", store_ckpts=True,
                        stop_step=None, **vargs):
    """Segmented forward; returns (xt, vt, esc, c, aux, ckpts).

    ``store_ckpts=False`` emits empty per-segment stubs instead of the
    (nseg, N, 7) checkpoint stack — the output-only mode used by the
    microbatched path, whose backward recomputes checkpoints per chunk.

    ``stop_step`` (target variant only): the reference's while-loop keeps
    capturing ballistically until ALL rays have escaped (tracer.cpp:174-242)
    — a batch-composition-dependent horizon.  Since escape is monotone,
    "all escaped before step k" == "k >= max_i(escape step of ray i)", so a
    chunked/sharded caller passes the GLOBAL horizon (from
    :func:`_escape_steps`) and gets bit-identical capture semantics to the
    full-batch trace regardless of how rays are split.

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
            run = (k < stop_step) if stop_step is not None \
                else ~jnp.all(esc)
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
        if store_ckpts:
            ck = jnp.concatenate(
                [x, v, inside.astype(x.dtype)[:, None]], axis=-1)  # (N, 7)
        else:
            ck = jnp.zeros((0,), x.dtype)

        def run(carry):
            def body(j, cr):
                cr2, _ = step(cr, s * seg + j)
                return cr2
            # the last segment may be partial: run exactly max_steps total
            nsteps = jnp.minimum(seg, max_steps - s * seg)
            return lax.fori_loop(0, nsteps, body, carry)

        if step_gated and stop_step is not None:
            # a shard/chunk whose own rays all escaped must KEEP stepping
            # until the global horizon (ballistic capture continues)
            skip = s * seg >= stop_step
        else:
            skip = jnp.all(esc)
        carry2 = lax.cond(skip, lambda cr: cr, run, carry)
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
# Ray-axis microbatching: bounded memory at ANY batch size
# ---------------------------------------------------------------------------
#
# The checkpoint stack is (nseg, N, 7) and the replay buffer (seg, N, ~10);
# above ~1 GB of that state the TPU worker reproducibly crashed (3 crashes at
# 1.31M rays / 65^3, ROADMAP round-4 finding).  The checkpointed backward is
# per-ray-independent up to the final grid sum, so the fix is structural:
# chunk the ray axis.  The forward emits outputs only (store_ckpts=False);
# the backward lax.scans over chunks, recomputing each chunk's checkpoints
# and accumulating the voxel gradient.  Memory is O(chunk * (steps/seg + seg))
# regardless of N, at the cost of one extra forward pass when chunking is
# active (~+30% over the resident-checkpoint path).


def _exact_chunk_rays() -> int:
    """Ray-axis microbatch size for the exact path (0 disables chunking).

    Default 2^18 = 262144: at 129^3 (nseg 33, seg 32) that keeps
    checkpoints (~240 MB) + replay (~340 MB) comfortably inside the
    measured-safe envelope (the image flagship ran 900+ steps at exactly
    this scale, ROADMAP r4)."""
    return int(os.environ.get("ANRT_EXACT_CHUNK", str(1 << 18)))


def _pad_rows(a, pad, zero=False):
    if pad == 0:
        return a
    fill = (jnp.zeros((pad,) + a.shape[1:], a.dtype) if zero
            else jnp.repeat(a[:1], pad, axis=0))
    return jnp.concatenate([a, fill], axis=0)


def _to_chunks(arrs, chunk, zero_from=None):
    """Pad the ray axis to a chunk multiple and reshape to (nc, chunk, ...).

    Rows are padded with copies of ray 0 (benign dynamics); arrays at index
    >= ``zero_from`` (cotangents) are padded with zeros so padding
    contributes nothing to gradients."""
    n = arrs[0].shape[0]
    nc = -(-n // chunk)
    pad = nc * chunk - n
    out = []
    for i, a in enumerate(arrs):
        z = zero_from is not None and i >= zero_from
        out.append(_pad_rows(a, pad, zero=z).reshape(
            (nc, chunk) + a.shape[1:]))
    return out, nc, pad


def _escape_steps(field: GridField, x0, v0, ds, max_steps: int,
                  axis_name=None):
    """Per-ray escape step (the (k+1)-indexed step at which ``esc`` first
    becomes true; max_steps for never-escaping rays).

    Escape is monotone and independent of capture bookkeeping, so this is
    batch-decomposable: the global target-variant stopping horizon is
    ``max`` over every ray's escape step (see _forward_with_ckpts
    ``stop_step``)."""
    cf = CT.build_cell_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    e0 = jnp.full((x0.shape[0],), max_steps, dtype=jnp.int32)
    if axis_name is not None:
        e0 = lax.pcast(e0, axis_name, to="varying")

    def cond(s):
        step, x, v, inside, esc, e = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, inside, esc, e = s
        nv, nx = CT.eval_grad_from(*_fetch(cf, x, inside), field.h)
        v2 = v + (ds * nv)[:, None] * nx
        x2 = x + ds * v2
        cur_inside = G.inbounds(field, x2)
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)
        e2 = jnp.where(esc2 & ~esc, step + 1, e)
        return (step + 1, x2, v2, cur_inside, esc2, e2)

    *_, e = lax.while_loop(cond, body,
                           (jnp.zeros((), jnp.int32), x0, v0, inside0, esc0,
                            e0))
    return e


def _target_stop_step(field: GridField, x, v, ds, max_steps: int, chunk: int,
                      axis_name=None):
    """Global target-variant capture horizon, computed chunk-by-chunk."""
    if chunk and x.shape[0] > chunk:
        arrs, _, _ = _to_chunks([x, v], chunk)

        def one(args):
            return jnp.max(_escape_steps(field, args[0], args[1], ds,
                                         max_steps, axis_name=axis_name))

        return jnp.max(lax.map(one, tuple(arrs)))
    return jnp.max(_escape_steps(field, x, v, ds, max_steps,
                                 axis_name=axis_name))


def _forward_chunked(field: GridField, x, v, ds, max_steps: int, seg: int,
                     chunk: int, axis_name=None, variant="plain",
                     per_ray=(), stop_step=None, **vargs):
    """Output-only segmented forward, lax.map'ed over ray chunks.

    ``per_ray``: tuple of (name, (N, ...) array) variant args chunked
    alongside the rays (plane origins/normals, targets).  Returns
    (xt, vt, esc, c, aux) at the full N."""
    n = x.shape[0]
    names = tuple(k for k, _ in per_ray)
    arrs, nc, _ = _to_chunks([x, v] + [a for _, a in per_ray], chunk)

    def one(args):
        xx, vv, *pr = args
        va = dict(zip(names, pr))
        xt, vt, esc, c, aux, _ = _forward_with_ckpts(
            field, xx, vv, ds, max_steps, seg, axis_name=axis_name,
            variant=variant, store_ckpts=False, stop_step=stop_step,
            **va, **vargs)
        return xt, vt, esc, c, aux

    xt, vt, esc, c, aux = lax.map(one, tuple(arrs))

    def unf(a):
        return a.reshape((nc * chunk,) + a.shape[2:])[:n]

    return unf(xt), unf(vt), unf(esc), unf(c), unf(aux)


def _backward_chunked(field: GridField, x, v, dxt, dvt, ds, max_steps: int,
                      seg: int, chunk: int, axis_name=None, variant="plain",
                      per_ray=(), stop_step=None, **vargs):
    """Recompute checkpoints and run the exact backward, one ray chunk at a
    time, accumulating the (flattened) voxel gradient."""
    names = tuple(k for k, _ in per_ray)
    arrs, _, _ = _to_chunks(
        [x, v, dxt, dvt] + [a for _, a in per_ray], chunk, zero_from=2)

    def body(g, args):
        xx, vv, dxx, dvv, *pr = args
        va = dict(zip(names, pr))
        _, _, _, c, _, ckpts = _forward_with_ckpts(
            field, xx, vv, ds, max_steps, seg, axis_name=axis_name,
            variant=variant, stop_step=stop_step, **va, **vargs)
        gc = _backward_segments(field, ckpts, c, dxx, dvv, ds, max_steps,
                                seg, axis_name=axis_name, variant=variant,
                                **va, **vargs)
        return g + gc, None

    g0 = jnp.zeros((field.data.size,), field.data.dtype)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")
    g, _ = lax.scan(body, g0, tuple(arrs))
    return g


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
    Memory: O(min(N, ANRT_EXACT_CHUNK) * (steps/seg + seg)) — batches larger
    than the chunk size are microbatched along the ray axis, so the exact
    path is safe at any scale (the reference AD tape covers every scale GPU
    memory permits, core/tracer.py:16-66; round-4's unchunked path crashed
    the TPU worker above ~1 GB of checkpoint state).

    Exactness note: rays that never exit within max_steps return their
    untouched initial ``v0`` as vt, so their vt cotangent is zeroed in the
    backward (== jax.grad through the unrolled forward; the reference's
    BackTracerC family instead propagates it — an approximation this module
    deliberately does not inherit, ADVICE r4).
    """
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, _, _, _ = _forward_chunked(field, x, v, ds, steps, seg, chunk)
        return xt, vt
    xt, vt, _, _, _, _ = _forward_with_ckpts(field, x, v, ds, steps, seg)
    return xt, vt


def _trace_exact_fwd(rif, x, v, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, esc, _, _ = _forward_chunked(field, x, v, ds, steps, seg,
                                             chunk)
        # microbatched: no resident checkpoints — the backward recomputes
        # them per chunk from (x, v)
        return (xt, vt), (rif, x, v, esc, None, None)
    xt, vt, esc, c, _, ckpts = _forward_with_ckpts(field, x, v, ds, steps, seg)
    return (xt, vt), (rif, x, v, esc, c, ckpts)


def _trace_exact_bwd(h, ds, seg, res, cts):
    rif, x, v, esc, c, ckpts = res
    dxt, dvt = cts
    # never-exited rays report the untouched initial v0 -> true vt grad is 0
    dvt = jnp.where(esc[:, None], dvt, 0.0)
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    if ckpts is None:
        g = _backward_chunked(field, x, v, dxt, dvt, ds, steps, seg,
                              _exact_chunk_rays())
    else:
        g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg)
    zeros3 = jnp.zeros_like(x)
    return g.reshape(rif.shape), zeros3, zeros3


trace_exact.defvjp(_trace_exact_fwd, _trace_exact_bwd)


# ---------------------------------------------------------------------------
# trace_plane_exact
# ---------------------------------------------------------------------------

def _bcast_per_ray(arr, x):
    """Normalize a (3,) / (1,3) per-ray vector arg to (N, 3) (ADVICE r4)."""
    a = arr[None] if arr.ndim == 1 else arr
    if a.shape[0] != x.shape[0]:
        a = jnp.broadcast_to(a, x.shape)
    return a


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def trace_plane_exact(rif, x, v, pln_o, pln_d, h, ds, seg: int = 32):
    """Plane-terminated trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_plane` (returns (xt, vt, miss);
    missed rays' position cotangent is zeroed, core/tracer.py:366-371).
    Missed rays' vt is the untouched v0, so their vt cotangent is also
    zeroed — true autodiff behavior; the reference's BackPlaneTracerC
    propagates it (ADVICE r4, deliberate exactness deviation)."""
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    po, pd = _bcast_per_ray(pln_o, x), _bcast_per_ray(pln_d, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, esc, _, _ = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="plane",
            per_ray=(("pln_o", po), ("pln_d", pd)))
        return xt, vt, ~esc
    xt, vt, esc, _, _, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="plane", pln_o=po, pln_d=pd)
    return xt, vt, ~esc


def _trace_plane_exact_fwd(rif, x, v, pln_o, pln_d, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    po, pd = _bcast_per_ray(pln_o, x), _bcast_per_ray(pln_d, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, esc, _, _ = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="plane",
            per_ray=(("pln_o", po), ("pln_d", pd)))
        return (xt, vt, ~esc), (rif, x, v, po, pd, ~esc, None, None,
                                pln_o, pln_d)
    xt, vt, esc, c, _, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="plane", pln_o=po, pln_d=pd)
    return (xt, vt, ~esc), (rif, x, v, po, pd, ~esc, c, ckpts, pln_o, pln_d)


def _trace_plane_exact_bwd(h, ds, seg, res, cts):
    rif, x, v, po, pd, miss, c, ckpts, pln_o, pln_d = res
    dxt, dvt, _ = cts
    # reference zeroes missed rays' xt cotangent (core/tracer.py:366-371);
    # their vt is the untouched v0, so its true cotangent is zero too
    dxt = jnp.where(miss[:, None], 0.0, dxt)
    dvt = jnp.where(miss[:, None], 0.0, dvt)
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    if ckpts is None:
        g = _backward_chunked(field, x, v, dxt, dvt, ds, steps, seg,
                              _exact_chunk_rays(), variant="plane",
                              per_ray=(("pln_o", po), ("pln_d", pd)))
    else:
        g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                               variant="plane", pln_o=po, pln_d=pd)
    zeros3 = jnp.zeros_like(x)
    return (g.reshape(rif.shape), zeros3, zeros3,
            jnp.zeros_like(pln_o), jnp.zeros_like(pln_d))


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
    tgt = _bcast_per_ray(target, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        # the capture horizon is the FULL batch's all-escaped step — compute
        # it first so per-chunk capture matches the unchunked trace exactly
        t_stop = _target_stop_step(field, x, v, ds, steps, chunk)
        xt, vt, _, _, d2 = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="target",
            per_ray=(("target", tgt),), stop_step=t_stop)
        return xt, vt, d2
    xt, vt, _, _, d2, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="target", target=tgt)
    return xt, vt, d2


def _trace_target_exact_fwd(rif, x, v, target, h, ds, seg):
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    tgt = _bcast_per_ray(target, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        t_stop = _target_stop_step(field, x, v, ds, steps, chunk)
        xt, vt, _, _, d2 = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="target",
            per_ray=(("target", tgt),), stop_step=t_stop)
        return (xt, vt, d2), (rif, x, v, tgt, None, None, target, t_stop)
    xt, vt, _, c, d2, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="target", target=tgt)
    return (xt, vt, d2), (rif, x, v, tgt, c, ckpts, target, None)


def _trace_target_exact_bwd(h, ds, seg, res, cts):
    rif, x, v, tgt, c, ckpts, target, t_stop = res
    dxt, dvt, _ = cts
    field = GridField(rif, h)
    steps = E.max_steps_fwd(max(rif.shape), h, ds)
    if ckpts is None:
        g = _backward_chunked(field, x, v, dxt, dvt, ds, steps, seg,
                              _exact_chunk_rays(), variant="target",
                              per_ray=(("target", tgt),), stop_step=t_stop)
    else:
        g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                               variant="target", target=tgt)
    zeros3 = jnp.zeros_like(x)
    return g.reshape(rif.shape), zeros3, zeros3, jnp.zeros_like(target)


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
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, _, _, _ = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="sdf",
            sdf=GridField(sdf, h))
        return xt, vt
    xt, vt, _, _, _, _ = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="sdf", sdf=GridField(sdf, h))
    return xt, vt


def _trace_sdf_exact_fwd(rif, sdf, x, v, h, ds, seg):
    field = GridField(rif, h)
    steps = int(2.0 * h * max(rif.shape) / ds)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        xt, vt, _, _, _ = _forward_chunked(
            field, x, v, ds, steps, seg, chunk, variant="sdf",
            sdf=GridField(sdf, h))
        return (xt, vt), (rif, sdf, x, v, None, None)
    xt, vt, _, c, _, ckpts = _forward_with_ckpts(
        field, x, v, ds, steps, seg, variant="sdf", sdf=GridField(sdf, h))
    return (xt, vt), (rif, sdf, x, v, c, ckpts)


def _trace_sdf_exact_bwd(h, ds, seg, res, cts):
    rif, sdf, x, v, c, ckpts = res
    dxt, dvt = cts
    field = GridField(rif, h)
    steps = int(2.0 * h * max(rif.shape) / ds)
    if ckpts is None:
        g = _backward_chunked(field, x, v, dxt, dvt, ds, steps, seg,
                              _exact_chunk_rays(), variant="sdf",
                              sdf=GridField(sdf, h))
    else:
        g = _backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                               variant="sdf", sdf=GridField(sdf, h))
    zeros3 = jnp.zeros_like(x)
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
                     seg: int, store_ckpts=True, axis_name=None):
    nseg = -(-max_steps // seg)
    inside0 = C.cyl_inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)
    c0 = jnp.zeros((x0.shape[0],), dtype=jnp.int32)
    if axis_name is not None:
        c0 = lax.pcast(c0, axis_name, to="varying")

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
        if store_ckpts:
            ck = jnp.concatenate(
                [x, v, esc.astype(x.dtype)[:, None]], axis=-1)  # (N, 7)
        else:
            ck = jnp.zeros((0,), x.dtype)

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
                        max_steps: int, seg: int, axis_name=None):
    nseg = ckpts.shape[0]
    ds = jnp.asarray(ds, dtype=ckpts.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    g0 = jnp.zeros_like(field.data)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")
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


def _fwd_cable_chunked(field, x, v, target, ds, steps, seg, chunk,
                       axis_name=None):
    arrs, nc, _ = _to_chunks([x, v, target], chunk)

    def one(args):
        xx, vv, tt = args
        xt, vt, d2, c, _ = _fwd_ckpts_cable(field, xx, vv, tt, ds, steps,
                                            seg, store_ckpts=False,
                                            axis_name=axis_name)
        return xt, vt, d2

    xt, vt, d2 = lax.map(one, tuple(arrs))
    n = x.shape[0]

    def unf(a):
        return a.reshape((nc * chunk,) + a.shape[2:])[:n]

    return unf(xt), unf(vt), unf(d2)


def _bwd_cable_chunked(field, x, v, target, dxt, dvt, ds, steps, seg, chunk,
                       axis_name=None):
    arrs, _, _ = _to_chunks([x, v, target, dxt, dvt], chunk, zero_from=3)

    def body(g, args):
        xx, vv, tt, dxx, dvv = args
        _, _, _, c, ckpts = _fwd_ckpts_cable(field, xx, vv, tt, ds, steps,
                                             seg, axis_name=axis_name)
        gc = _bwd_segments_cable(field, ckpts, c, dxx, dvv, ds, steps, seg,
                                 axis_name=axis_name)
        return g + gc, None

    g0 = jnp.zeros_like(field.data)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")
    g, _ = lax.scan(body, g0, tuple(arrs))
    return g


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 6, 7))
def trace_cable_exact(rif, radius, length, x, v, target, ds, seg: int = 32):
    """Cylinder-volume trace with exact checkpointed gradients.

    Same semantics as :func:`tracer.trace_cable` (returns (xt, vt, dist2);
    only the 1D radial profile receives a gradient).  Batches above
    ANRT_EXACT_CHUNK rays are microbatched (bounded memory at any scale)."""
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)  # tracer.cpp:332
    tgt = _bcast_per_ray(target, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        return _fwd_cable_chunked(field, x, v, tgt, ds, steps, seg, chunk)
    xt, vt, d2, _, _ = _fwd_ckpts_cable(field, x, v, tgt, ds, steps, seg)
    return xt, vt, d2


def _trace_cable_exact_fwd(rif, radius, length, x, v, target, ds, seg):
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)
    tgt = _bcast_per_ray(target, x)
    chunk = _exact_chunk_rays()
    if chunk and x.shape[0] > chunk:
        out = _fwd_cable_chunked(field, x, v, tgt, ds, steps, seg, chunk)
        return out, (rif, x, v, tgt, None, None, target)
    xt, vt, d2, c, ckpts = _fwd_ckpts_cable(field, x, v, tgt, ds, steps,
                                            seg)
    return (xt, vt, d2), (rif, x, v, tgt, c, ckpts, target)


def _trace_cable_exact_bwd(radius, length, ds, seg, res, cts):
    rif, x, v, tgt, c, ckpts, target = res
    dxt, dvt, _ = cts
    field = CylinderField(rif, radius, length)
    steps = int(4.0 * length / ds)
    if ckpts is None:
        g = _bwd_cable_chunked(field, x, v, tgt, dxt, dvt, ds, steps, seg,
                               _exact_chunk_rays())
    else:
        g = _bwd_segments_cable(field, ckpts, c, dxt, dvt, ds, steps, seg)
    zeros3 = jnp.zeros_like(x)
    return g, zeros3, zeros3, jnp.zeros_like(target)


trace_cable_exact.defvjp(_trace_cable_exact_fwd, _trace_cable_exact_bwd)

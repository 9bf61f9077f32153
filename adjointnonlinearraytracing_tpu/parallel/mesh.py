"""Multi-device ray parallelism: mesh construction + sharded trace/adjoint.

The reference is single-GPU (SURVEY.md §2.3); here ray-batch data parallelism
is first-class and TPU-native: rays are sharded over a 1D device mesh
(axis "rays"), the index grid ``n`` is replicated, the forward/backward
steppers run per-shard inside `shard_map` (so the all-escaped early exit is a
cheap *per-shard* reduction, no cross-device sync in the hot loop), and the
voxel-gradient partials are all-reduced with a single `psum` over ICI at the
end of the adjoint sweep.

Multi-host: call `jax.distributed.initialize()` before building the mesh and
these functions work unchanged — rays shard across all global devices, the
psum rides ICI within a slice and DCN across hosts.

On overlapping the psum with the adjoint sweep (BASELINE.json mentions it):
measured numbers make it moot at these scales.  The voxel-gradient allreduce
moves one grad table per backward (70 MB at 129^3 after the supercell fold,
or ~0.5 GB pre-fold) — ~1-6 ms over v5e ICI (~100+ GB/s) against a ~2 s
adjoint sweep that is per-row scatter bound (pallas/README.md), i.e. <0.5%.
Chunk-wise per-segment psums would add K-1 extra collectives and change
accumulation order for at most a fraction of that 0.5%; deliberately not
implemented.  Revisit only if grids grow to >=513^3 AND interconnect drops
to DCN-only (multi-pod), where the allreduce reaches percent scale.

TP/PP/EP do not apply to this workload (no matmul weights to shard — SURVEY.md
§2.3); the scaling dimension is the ray batch, exactly like the enoki
SIMT batch but across chips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.grid import GridField
from ..tracer import api as _api
from ..tracer import eikonal as E
from ..tracer import fast as F

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_ray_mesh(devices=None) -> Mesh:
    """1D mesh over all (or the given) devices with axis name 'rays'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), ("rays",))


def pad_rays(x: jax.Array, n_shards: int, axis: int = 0):
    """Pad the ray axis to a multiple of ``n_shards``; returns (padded, mask).

    Rejection-sampled / ragged sources produce masked batches already; this
    adds the SPMD padding on top (inactive padding rays are handled by the
    steppers' masks and must be excluded from losses via the returned mask).
    """
    n = x.shape[axis]
    rem = (-n) % n_shards
    mask = jnp.arange(n + rem) < n
    if rem == 0:
        return x, mask
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), mask


def shard_rays(mesh: Mesh, *arrays):
    """Device_put ray arrays with P('rays', ...) sharding."""
    out = []
    for a in arrays:
        spec = P("rays", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh: Mesh, a: jax.Array):
    return jax.device_put(a, NamedSharding(mesh, P()))


def make_sharded_trace(mesh: Mesh, h: float, ds: float, res_max: int,
                       nbuckets: int = 0):
    """Build a drop-in differentiable ``trace(rif, x, v)`` sharded over rays.

    Forward: per-shard eikonal stepping (replicated rif).  Backward: per-shard
    constant-memory adjoint producing a voxel-gradient partial, all-reduced
    with `lax.psum` over the 'rays' axis (SURVEY.md §2.3 north star).

    ``nbuckets > 1`` applies exit-step compaction *inside each shard*
    (VERDICT r3 #5): every shard argsorts its own rays by the straight-chord
    step estimate and traces K static equal buckets, so each per-shard
    while_loop stops at roughly its own longest member.  The backward sweep
    buckets by the reverse chord (the same line, traced from the exit state),
    and the voxel-gradient partial is permutation-invariant, so outputs and
    gradients equal the unbucketed path (tests/test_compaction.py).  Shard
    sizes not divisible by ``nbuckets`` fall back to the plain path.
    """
    from ..tracer import compaction as CP

    steps_f = E.max_steps_fwd(res_max, h, ds)
    steps_b = E.max_steps_bwd(res_max, h, ds)

    ray_spec = P("rays", None)

    def _fwd_local(rif, x, v):
        impl = _api._impl(rif, h, ds)
        field = GridField(rif, h)
        n = x.shape[0]
        if nbuckets > 1 and n % nbuckets == 0:
            order = jnp.argsort(CP.chord_steps(rif.shape, h, x, v, ds))
            xs = jnp.take(x, order, axis=0)
            vs = jnp.take(v, order, axis=0)
            size = n // nbuckets
            xts, vts = [], []
            for b in range(nbuckets):
                s = slice(b * size, (b + 1) * size)
                xt_b, vt_b = impl.trace(field, xs[s], vs[s], ds, steps_f)
                xts.append(xt_b)
                vts.append(vt_b)
            inv = jnp.argsort(order)
            return (jnp.take(jnp.concatenate(xts), inv, axis=0),
                    jnp.take(jnp.concatenate(vts), inv, axis=0))
        return impl.trace(field, x, v, ds, steps_f)

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec),
    )

    def _bwd_local(rif, xt, vt, dxt, dvt):
        impl = _api._impl(rif, h, ds)
        field = GridField(rif, h)
        n = xt.shape[0]
        if nbuckets > 1 and n % nbuckets == 0:
            # reverse sweep walks the same line backwards from the exit
            # state: bucket by the chord of (xt, -vt)
            order = jnp.argsort(CP.chord_steps(rif.shape, h, xt, -vt, ds))
            xs = jnp.take(xt, order, axis=0)
            vs = jnp.take(vt, order, axis=0)
            dxs = jnp.take(dxt, order, axis=0)
            dvs = jnp.take(dvt, order, axis=0)
            size = n // nbuckets
            g = None
            for b in range(nbuckets):
                s = slice(b * size, (b + 1) * size)
                gb = impl.backtrace(field, xs[s], vs[s], dxs[s], dvs[s], ds,
                                    steps_b, axis_name="rays")
                g = gb if g is None else g + gb
        else:
            g = impl.backtrace(field, xt, vt, dxt, dvt, ds, steps_b,
                               axis_name="rays")
        return jax.lax.psum(g, "rays")

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, x, v):
        return fwd_sharded(rif, x, v)

    def traced_fwd(rif, x, v):
        out = fwd_sharded(rif, x, v)
        return out, (rif, out[0], out[1])

    def traced_bwd(res, cts):
        rif, xt, vt = res
        dxt, dvt = cts
        g = bwd_sharded(rif, xt, vt, dxt, dvt)
        return g.reshape(rif.shape), jnp.zeros_like(xt), jnp.zeros_like(vt)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def _exact_local_fns(h, ds, steps, seg, variant, per_ray_names, **grid_args):
    """Per-shard forward/backward closures for a checkpointed-exact variant.

    Used by the ``exact=True`` sharded builders: the forward emits outputs
    only (no resident checkpoint stack) and the backward recomputes each
    chunk's checkpoints from the saved ray inputs (tracer/checkpointed.py
    microbatching — memory bounded by ANRT_EXACT_CHUNK per shard)."""
    from ..tracer import checkpointed as CK

    def fwd_local(rif, x, v, *pr):
        field = GridField(rif, h)
        per_ray = tuple(zip(per_ray_names, pr))
        chunk = CK._exact_chunk_rays()
        if chunk and x.shape[0] > chunk:
            xt, vt, esc, c, aux = CK._forward_chunked(
                field, x, v, ds, steps, seg, chunk, axis_name="rays",
                variant=variant, per_ray=per_ray, **grid_args)
        else:
            xt, vt, esc, c, aux, _ = CK._forward_with_ckpts(
                field, x, v, ds, steps, seg, axis_name="rays",
                variant=variant, store_ckpts=False,
                **dict(per_ray), **grid_args)
        return xt, vt, esc, aux

    def bwd_local(rif, x, v, dxt, dvt, *pr):
        field = GridField(rif, h)
        per_ray = tuple(zip(per_ray_names, pr))
        chunk = CK._exact_chunk_rays()
        if chunk and x.shape[0] > chunk:
            g = CK._backward_chunked(
                field, x, v, dxt, dvt, ds, steps, seg, chunk,
                axis_name="rays", variant=variant, per_ray=per_ray,
                **grid_args)
        else:
            _, _, _, c, _, ckpts = CK._forward_with_ckpts(
                field, x, v, ds, steps, seg, axis_name="rays",
                variant=variant, **dict(per_ray), **grid_args)
            g = CK._backward_segments(
                field, ckpts, c, dxt, dvt, ds, steps, seg,
                axis_name="rays", variant=variant, **dict(per_ray),
                **grid_args)
        return jax.lax.psum(g, "rays")

    return fwd_local, bwd_local


def make_sharded_trace_plane(mesh: Mesh, h: float, ds: float, res_max: int,
                             exact: bool = False, seg: int = 32):
    """Sharded differentiable ``trace_plane(rif, x, v, pln_o, pln_d)``.

    ``exact=True`` swaps the constant-memory adjoint for the checkpointed-
    exact backward (drift-free at any precision; VERDICT r4 #7), with the
    reference's miss-ray xt-cotangent zeroing plus the true-autodiff vt
    zeroing (missed rays' vt is the untouched v0)."""
    steps_f = E.max_steps_fwd(res_max, h, ds)
    steps_b = E.max_steps_bwd(res_max, h, ds)
    ray_spec = P("rays", None)

    if exact:
        fwd_local, bwd_local = _exact_local_fns(
            h, ds, steps_f, seg, "plane", ("pln_o", "pln_d"))

        def _fwd_local(rif, x, v, po, pd):
            xt, vt, esc, _ = fwd_local(rif, x, v, po, pd)
            return xt, vt, ~esc
    else:
        def _fwd_local(rif, x, v, po, pd):
            return _api._impl(rif, h, ds).trace_plane(GridField(rif, h), x, v,
                                                      po, pd, ds, steps_f)

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, P("rays")),
    )

    if exact:
        bwd_sharded = shard_map(
            bwd_local, mesh=mesh,
            in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec,
                      ray_spec, ray_spec),
            out_specs=P(),
        )
    else:
        def _bwd_local(rif, xt, vt, dxt, dvt):
            g = _api._impl(rif, h, ds).backtrace(
                GridField(rif, h), xt, vt, dxt, dvt, ds, steps_b,
                axis_name="rays")
            return jax.lax.psum(g, "rays")

        bwd_sharded = shard_map(
            _bwd_local, mesh=mesh,
            in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
            out_specs=P(),
        )

    @jax.custom_vjp
    def traced(rif, x, v, po, pd):
        return fwd_sharded(rif, x, v, po, pd)

    def traced_fwd(rif, x, v, po, pd):
        out = fwd_sharded(rif, x, v, po, pd)
        xt, vt, miss = out
        if exact:
            return out, (rif, x, v, po, pd, miss)
        return out, (rif, xt, vt, po, pd, miss)

    def traced_bwd(res, cts):
        rif, a, b, po, pd, miss = res
        dxt, dvt, _ = cts
        dxt = jnp.where(miss[:, None], 0.0, dxt)
        if exact:
            dvt = jnp.where(miss[:, None], 0.0, dvt)
            g = bwd_sharded(rif, a, b, dxt, dvt, po, pd)
        else:
            g = bwd_sharded(rif, a, b, dxt, dvt)
        z = jnp.zeros_like(a)
        return g.reshape(rif.shape), z, z, jnp.zeros_like(po), \
            jnp.zeros_like(pd)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_target(mesh: Mesh, h: float, ds: float, res_max: int,
                              exact: bool = False, seg: int = 32):
    """Sharded differentiable ``trace_target(rif, x, v, target)``.

    ``exact=True``: checkpointed-exact backward (never-captured rays are
    gated off by their capture step, so no extra cotangent fixup needed)."""
    steps_f = E.max_steps_fwd(res_max, h, ds)
    steps_b = E.max_steps_bwd(res_max, h, ds)
    ray_spec = P("rays", None)

    if exact:
        from ..tracer import checkpointed as CK

        # the target variant keeps capturing ballistically until ALL rays
        # (across every shard) have escaped; the per-shard forward therefore
        # gates on the pmax'd global escape horizon, giving bit-identical
        # capture semantics to the full-batch single-device trace
        def _fwd_local(rif, x, v, tgt):
            field = GridField(rif, h)
            chunk = CK._exact_chunk_rays()
            t_stop = jax.lax.pmax(
                CK._target_stop_step(field, x, v, ds, steps_f, chunk,
                                     axis_name="rays"), "rays")
            if chunk and x.shape[0] > chunk:
                xt, vt, _, _, d2 = CK._forward_chunked(
                    field, x, v, ds, steps_f, seg, chunk, axis_name="rays",
                    variant="target", per_ray=(("target", tgt),),
                    stop_step=t_stop)
            else:
                xt, vt, _, _, d2, _ = CK._forward_with_ckpts(
                    field, x, v, ds, steps_f, seg, axis_name="rays",
                    variant="target", store_ckpts=False, target=tgt,
                    stop_step=t_stop)
            return xt, vt, d2, t_stop[None]

        def _bwd_local(rif, x, v, tgt, dxt, dvt, t_stop_shard):
            field = GridField(rif, h)
            t_stop = t_stop_shard[0]
            chunk = CK._exact_chunk_rays()
            if chunk and x.shape[0] > chunk:
                g = CK._backward_chunked(
                    field, x, v, dxt, dvt, ds, steps_f, seg, chunk,
                    axis_name="rays", variant="target",
                    per_ray=(("target", tgt),), stop_step=t_stop)
            else:
                _, _, _, c, _, ckpts = CK._forward_with_ckpts(
                    field, x, v, ds, steps_f, seg, axis_name="rays",
                    variant="target", target=tgt, stop_step=t_stop)
                g = CK._backward_segments(
                    field, ckpts, c, dxt, dvt, ds, steps_f, seg,
                    axis_name="rays", variant="target", target=tgt)
            return jax.lax.psum(g, "rays")

        fwd_sharded = shard_map(
            _fwd_local, mesh=mesh,
            in_specs=(P(), ray_spec, ray_spec, ray_spec),
            out_specs=(ray_spec, ray_spec, P("rays"), P("rays")),
        )
        bwd_sharded = shard_map(
            _bwd_local, mesh=mesh,
            in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                      P("rays")),
            out_specs=P(),
        )

        @jax.custom_vjp
        def traced(rif, x, v, tgt):
            xt, vt, d2, _ = fwd_sharded(rif, x, v, tgt)
            return xt, vt, d2

        def traced_fwd(rif, x, v, tgt):
            xt, vt, d2, t_stop = fwd_sharded(rif, x, v, tgt)
            return (xt, vt, d2), (rif, x, v, tgt, t_stop)

        def traced_bwd(res, cts):
            rif, x, v, tgt, t_stop = res
            dxt, dvt, _ = cts
            g = bwd_sharded(rif, x, v, tgt, dxt, dvt, t_stop)
            z = jnp.zeros_like(x)
            return g.reshape(rif.shape), z, z, jnp.zeros_like(tgt)

        traced.defvjp(traced_fwd, traced_bwd)
        return traced

    def _fwd_local(rif, x, v, tgt):
        return _api._impl(rif, h, ds).trace_target(GridField(rif, h),
                                                   x, v, tgt, ds,
                                                   steps_f)

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, P("rays")),
    )

    def _bwd_local(rif, xt, vt, dxt, dvt):
        g = _api._impl(rif, h, ds).backtrace(
            GridField(rif, h), xt, vt, dxt, dvt, ds, steps_b,
            axis_name="rays")
        return jax.lax.psum(g, "rays")

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, x, v, tgt):
        return fwd_sharded(rif, x, v, tgt)

    def traced_fwd(rif, x, v, tgt):
        out = fwd_sharded(rif, x, v, tgt)
        return out, (rif, out[0], out[1], tgt)

    def traced_bwd(res, cts):
        rif, a, b, tgt = res
        dxt, dvt, _ = cts
        g = bwd_sharded(rif, a, b, dxt, dvt)
        z = jnp.zeros_like(a)
        return g.reshape(rif.shape), z, z, jnp.zeros_like(tgt)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_sdf(mesh: Mesh, h: float, ds: float, res_max: int,
                           exact: bool = False, seg: int = 32):
    """Sharded differentiable ``trace_sdf(rif, sdf, x, v)`` (VERDICT r4 #7).

    Only rif receives a gradient (the sdf grid's cotangent is zero,
    core/tracer.py:461-479); both grids are replicated, rays sharded."""
    steps_f = int(2.0 * h * res_max / ds)  # tracer.cpp:262
    steps_b = E.max_steps_bwd(res_max, h, ds)
    ray_spec = P("rays", None)

    if exact:
        from ..tracer import checkpointed as CK

        def _fwd_local(rif, sdf, x, v):
            field = GridField(rif, h)
            chunk = CK._exact_chunk_rays()
            if chunk and x.shape[0] > chunk:
                xt, vt, _, _, _ = CK._forward_chunked(
                    field, x, v, ds, steps_f, seg, chunk, axis_name="rays",
                    variant="sdf", sdf=GridField(sdf, h))
            else:
                xt, vt, _, _, _, _ = CK._forward_with_ckpts(
                    field, x, v, ds, steps_f, seg, axis_name="rays",
                    variant="sdf", store_ckpts=False, sdf=GridField(sdf, h))
            return xt, vt

        def _bwd_local(rif, sdf, x, v, dxt, dvt):
            field = GridField(rif, h)
            chunk = CK._exact_chunk_rays()
            if chunk and x.shape[0] > chunk:
                g = CK._backward_chunked(
                    field, x, v, dxt, dvt, ds, steps_f, seg, chunk,
                    axis_name="rays", variant="sdf", sdf=GridField(sdf, h))
            else:
                _, _, _, c, _, ckpts = CK._forward_with_ckpts(
                    field, x, v, ds, steps_f, seg, axis_name="rays",
                    variant="sdf", sdf=GridField(sdf, h))
                g = CK._backward_segments(
                    field, ckpts, c, dxt, dvt, ds, steps_f, seg,
                    axis_name="rays", variant="sdf", sdf=GridField(sdf, h))
            return jax.lax.psum(g, "rays")
    else:
        def _fwd_local(rif, sdf, x, v):
            return _api._impl(rif, h, ds).trace_sdf(
                GridField(rif, h), GridField(sdf, h), x, v, ds, steps_f)

        def _bwd_local(rif, sdf, xt, vt, dxt, dvt):
            g = _api._impl(rif, h, ds).backtrace_sdf(
                GridField(rif, h), GridField(sdf, h), xt, vt, dxt, dvt, ds,
                steps_b, axis_name="rays")
            return jax.lax.psum(g, "rays")

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), P(), ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec),
    )
    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), P(), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, sdf, x, v):
        return fwd_sharded(rif, sdf, x, v)

    def traced_fwd(rif, sdf, x, v):
        out = fwd_sharded(rif, sdf, x, v)
        if exact:
            return out, (rif, sdf, x, v)
        return out, (rif, sdf, out[0], out[1])

    def traced_bwd(res, cts):
        rif, sdf, a, b = res
        dxt, dvt = cts
        g = bwd_sharded(rif, sdf, a, b, dxt, dvt)
        z = jnp.zeros_like(a)
        return g.reshape(rif.shape), jnp.zeros_like(sdf), z, z

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_cable(mesh: Mesh, radius: float, length: float,
                             ds: float, exact: bool = False, seg: int = 32):
    """Sharded differentiable ``trace_cable(rif, x, v, target)``
    (VERDICT r4 #7): rays + per-ray targets sharded, the 1D radial profile
    replicated, its gradient psum'd over the 'rays' axis."""
    from ..fields.cylinder import CylinderField

    steps = int(4.0 * length / ds)  # tracer.cpp:332
    ray_spec = P("rays", None)

    if exact:
        from ..tracer import checkpointed as CK

        def _fwd_local(rif, x, v, tgt):
            field = CylinderField(rif, radius, length)
            chunk = CK._exact_chunk_rays()
            if chunk and x.shape[0] > chunk:
                return CK._fwd_cable_chunked(field, x, v, tgt, ds, steps,
                                             seg, chunk, axis_name="rays")
            xt, vt, d2, _, _ = CK._fwd_ckpts_cable(field, x, v, tgt, ds,
                                                   steps, seg,
                                                   store_ckpts=False,
                                                   axis_name="rays")
            return xt, vt, d2

        def _bwd_local(rif, x, v, tgt, dxt, dvt):
            field = CylinderField(rif, radius, length)
            chunk = CK._exact_chunk_rays()
            if chunk and x.shape[0] > chunk:
                g = CK._bwd_cable_chunked(field, x, v, tgt, dxt, dvt, ds,
                                          steps, seg, chunk,
                                          axis_name="rays")
            else:
                _, _, _, c, ckpts = CK._fwd_ckpts_cable(field, x, v, tgt,
                                                        ds, steps, seg,
                                                        axis_name="rays")
                g = CK._bwd_segments_cable(field, ckpts, c, dxt, dvt, ds,
                                           steps, seg, axis_name="rays")
            return jax.lax.psum(g, "rays")
    else:
        def _fwd_local(rif, x, v, tgt):
            return E.trace_cable(CylinderField(rif, radius, length), x, v,
                                 tgt, ds, steps)

        def _bwd_local(rif, xt, vt, _tgt, dxt, dvt):
            g = E.backtrace_cable(CylinderField(rif, radius, length), xt,
                                  vt, dxt, dvt, ds, steps,
                                  axis_name="rays")
            return jax.lax.psum(g, "rays")

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, P("rays")),
    )
    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, x, v, tgt):
        return fwd_sharded(rif, x, v, tgt)

    def traced_fwd(rif, x, v, tgt):
        out = fwd_sharded(rif, x, v, tgt)
        if exact:
            return out, (rif, x, v, tgt)
        return out, (rif, out[0], out[1], tgt)

    def traced_bwd(res, cts):
        rif, a, b, tgt = res
        dxt, dvt, _ = cts
        g = bwd_sharded(rif, a, b, tgt, dxt, dvt)
        z = jnp.zeros_like(a)
        return g, z, z, jnp.zeros_like(tgt)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_exact(mesh: Mesh, h: float, ds: float, res_max: int,
                             seg: int = 32):
    """Sharded checkpointed-exact trace: ray-sharded checkpoints, psum'd grad.

    Per-shard batches above ANRT_EXACT_CHUNK rays are microbatched inside the
    shard (tracer/checkpointed.py chunked path), so the memory envelope is
    bounded regardless of global batch size; the backward then recomputes
    each chunk's checkpoints from the saved ray inputs instead of keeping a
    resident (nseg, N, 7) stack."""
    from ..tracer import checkpointed as CK

    steps = E.max_steps_fwd(res_max, h, ds)
    ray_spec = P("rays", None)

    def _chunked(n_local):
        chunk = CK._exact_chunk_rays()
        return bool(chunk) and n_local > chunk

    def _fwd_out_local(rif, x, v):
        field = GridField(rif, h)
        if _chunked(x.shape[0]):
            xt, vt, esc, _, _ = CK._forward_chunked(
                field, x, v, ds, steps, seg, CK._exact_chunk_rays(),
                axis_name="rays")
        else:
            xt, vt, esc, _, _, _ = CK._forward_with_ckpts(
                field, x, v, ds, steps, seg, axis_name="rays",
                store_ckpts=False)
        return xt, vt, esc

    fwd_out_sharded = shard_map(
        _fwd_out_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, P("rays")),
    )

    def _bwd_local(rif, x, v, dxt, dvt):
        field = GridField(rif, h)
        if _chunked(x.shape[0]):
            g = CK._backward_chunked(field, x, v, dxt, dvt, ds, steps, seg,
                                     CK._exact_chunk_rays(),
                                     axis_name="rays")
        else:
            _, _, _, c, _, ckpts = CK._forward_with_ckpts(
                field, x, v, ds, steps, seg, axis_name="rays")
            g = CK._backward_segments(field, ckpts, c, dxt, dvt, ds, steps,
                                      seg, axis_name="rays")
        return jax.lax.psum(g, "rays")

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, x, v):
        xt, vt, _ = fwd_out_sharded(rif, x, v)
        return xt, vt

    def traced_fwd(rif, x, v):
        xt, vt, esc = fwd_out_sharded(rif, x, v)
        return (xt, vt), (rif, x, v, esc)

    def traced_bwd(res, cts):
        rif, x, v, esc = res
        dxt, dvt = cts
        # never-exited rays report the untouched v0 -> true vt grad is 0
        dvt = jnp.where(esc[:, None], dvt, 0.0)
        g = bwd_sharded(rif, x, v, dxt, dvt)
        z = jnp.zeros_like(x)
        return g.reshape(rif.shape), z, z

    traced.defvjp(traced_fwd, traced_bwd)
    return traced

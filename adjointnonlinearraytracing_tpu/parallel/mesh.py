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


def make_sharded_trace_plane(mesh: Mesh, h: float, ds: float, res_max: int):
    """Sharded differentiable ``trace_plane(rif, x, v, pln_o, pln_d)``."""
    steps_f = E.max_steps_fwd(res_max, h, ds)
    steps_b = E.max_steps_bwd(res_max, h, ds)
    ray_spec = P("rays", None)

    def _fwd_local(rif, x, v, po, pd):
        return _api._impl(rif, h, ds).trace_plane(GridField(rif, h), x, v,
                                                  po, pd, ds, steps_f)

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec, ray_spec, ray_spec),
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
    def traced(rif, x, v, po, pd):
        return fwd_sharded(rif, x, v, po, pd)

    def traced_fwd(rif, x, v, po, pd):
        out = fwd_sharded(rif, x, v, po, pd)
        xt, vt, miss = out
        return out, (rif, xt, vt, miss)

    def traced_bwd(res, cts):
        rif, xt, vt, miss = res
        dxt, dvt, _ = cts
        dxt = jnp.where(miss[:, None], 0.0, dxt)
        g = bwd_sharded(rif, xt, vt, dxt, dvt)
        z = jnp.zeros_like(xt)
        return g.reshape(rif.shape), z, z, z, z

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_target(mesh: Mesh, h: float, ds: float, res_max: int):
    """Sharded differentiable ``trace_target(rif, x, v, target)``."""
    steps_f = E.max_steps_fwd(res_max, h, ds)
    steps_b = E.max_steps_bwd(res_max, h, ds)
    ray_spec = P("rays", None)

    def _fwd_local(rif, x, v, tgt):
        return _api._impl(rif, h, ds).trace_target(GridField(rif, h), x, v,
                                                   tgt, ds, steps_f)

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
        return out, (rif, out[0], out[1])

    def traced_bwd(res, cts):
        rif, xt, vt = res
        dxt, dvt, _ = cts
        g = bwd_sharded(rif, xt, vt, dxt, dvt)
        z = jnp.zeros_like(xt)
        return g.reshape(rif.shape), z, z, z

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_sharded_trace_exact(mesh: Mesh, h: float, ds: float, res_max: int,
                             seg: int = 32):
    """Sharded checkpointed-exact trace: ray-sharded checkpoints, psum'd grad."""
    from ..tracer import checkpointed as CK

    steps = E.max_steps_fwd(res_max, h, ds)
    ray_spec = P("rays", None)

    def _fwd_local(rif, x, v):
        field = GridField(rif, h)
        xt, vt, esc, c, _, ckpts = CK._forward_with_ckpts(
            field, x, v, ds, steps, seg, axis_name="rays")
        return xt, vt, c, ckpts

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P(), ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec, P("rays"), P(None, "rays", None)),
    )

    def _bwd_local(rif, ckpts, c, dxt, dvt):
        field = GridField(rif, h)
        g = CK._backward_segments(field, ckpts, c, dxt, dvt, ds, steps, seg,
                                  axis_name="rays")
        return jax.lax.psum(g, "rays")

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P(), P(None, "rays", None), P("rays"), ray_spec, ray_spec),
        out_specs=P(),
    )

    @jax.custom_vjp
    def traced(rif, x, v):
        xt, vt, _, _ = fwd_sharded(rif, x, v)
        return xt, vt

    def traced_fwd(rif, x, v):
        xt, vt, c, ckpts = fwd_sharded(rif, x, v)
        return (xt, vt), (rif, c, ckpts)

    def traced_bwd(res, cts):
        rif, c, ckpts = res
        dxt, dvt = cts
        g = bwd_sharded(rif, ckpts, c, dxt, dvt)
        n = ckpts.shape[1]
        z = jnp.zeros((n, 3), dtype=ckpts.dtype)
        return g.reshape(rif.shape), z, z

    traced.defvjp(traced_fwd, traced_bwd)
    return traced

"""Slab-sharded grids: trace/adjoint for volumes too large for one chip's HBM.

The replicated-grid path (parallel/mesh.py) holds the full cell table and its
gradient on every chip — fine through 513^3, impossible at 1025^3+ (ROADMAP
memory envelope).  This module spatially decomposes the grid along z into one
*slab* per device and keeps the per-chip footprint at table/D + grad/D plus
the local ray shard.

Design (ring rotation — the ring-attention pattern applied to volumes):

* 1D mesh; device d owns ray shard d AND (initially) z-slab d of the
  cell table and its gradient accumulator.
* Rays never move.  Each outer *phase*, a device advances only the rays
  whose current cell row lies in the slab it presently holds (other lanes
  freeze bit-exactly), for up to K inner steps; then the (slab, slab-grad)
  pair rotates one hop around the ring with `lax.ppermute`.  A ray stepping
  across a slab edge simply freezes until the neighbor slab arrives — the
  hand-off IS the rotation, no ray shuffling.  Per-lane step counters bound
  every lane at exactly the replicated path's max_steps, so a lane's state
  sequence is identical to the lockstep stepper's, merely time-dilated.
* The adjoint sweep runs the same rotation; each device scatter-adds its
  rays' contributions into whichever grad slab it holds at that moment, so
  when the rotation completes each slab's gradient has accumulated every
  device's contributions — the reduce_scatter is performed *by the ring*,
  no extra collective.

Memory per device at 1025^3 f32: table slab (1026/D)*1026^2*8*4 B — 4.3 GB
at D=8, 1.1 GB at D=32 — vs 34 GB replicated.  This is SURVEY §2.3's
grid-sharding row.  Two builders:

* :func:`make_slab_trace` — the round-4 prototype: full rif replicated,
  full cell table materialized host-side then split (useful for testing).
* :func:`make_slab_trace_zsharded` — the production path (VERDICT r4 #4):
  voxel data arrives Z-SHARDED (``pad_rif_z`` + P('rays', None, None)),
  each device builds only its own slab from local rows + a one-plane halo
  ppermute, the gradient is folded slab-locally with a one-plane boundary
  exchange and returned z-sharded.  No device ever holds the full cell
  table, full grid, or full gradient — the compiled per-device footprint
  is a handful of slab-sized ring buffers (~4x table/D, asserted by
  tests/test_slabs.py::test_per_device_footprint_at_257: 268 MB/device at
  257^3 vs >= 1.1 GB replicated).  Supports plain and plane variants.

Failure mode: lanes that exhaust the phase budget (``phase_slack`` extra
ring revolutions beyond the steps/K bound) are NaN-poisoned in outputs and
gradients — truncation is loud, never silent (ADVICE r4).

Exactness: tests/test_slabs.py asserts forward outputs equal tracer.trace
bitwise-modulo-f64-tolerance and gradients match the replicated adjoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..fields import cells as CT
from ..fields import grid as G
from ..fields.grid import GridField
from ..tracer import eikonal as E

try:  # jax >= 0.6
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _where3(m, a, b):
    return jnp.where(m[:, None], a, b)


def slab_rows(table_rows: int, ndev: int) -> int:
    """Cell-table z-rows per slab: ceil(table_rows / ndev)."""
    return -(-table_rows // ndev)


def build_slab_tables(field: GridField, ndev: int):
    """Full cell table split into ndev z-slabs: (ndev, S*rowlen, 8).

    (Prototype builds from the full field on host; a production 1025^3 run
    builds each slab from z-sharded voxel data + a 1-row halo exchange,
    never materializing the full table.)
    """
    cf = CT.build_cell_table(field)
    d1, h1, w1, _ = cf.table.shape
    S = slab_rows(d1, ndev)
    rows = cf.table.reshape(d1, h1 * w1, 8)
    pad = ndev * S - d1
    if pad:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, h1 * w1, 8), rows.dtype)], axis=0)
    return rows.reshape(ndev, S * h1 * w1, 8), S


def pad_rif_z(rif: jax.Array, ndev: int) -> jax.Array:
    """Edge-pad the voxel z-axis to ``ndev * slab_rows(res+1, ndev)`` rows.

    The padded rows are copies of the last z-plane, so (a) the local slab
    build's unclamped z-indexing reproduces the reference's border clamping
    exactly (volume.cpp:131-132), and (b) plain autodiff through this
    function folds padded-row gradients back into the boundary plane —
    callers differentiate straight through ``traced(pad_rif_z(rif), ...)``.
    Differentiable; keeps z-sharding under jit (concat of a z-sharded
    operand with a small edge block)."""
    res = rif.shape[0]
    zpad = ndev * slab_rows(res + 1, ndev)
    extra = zpad - res
    if extra == 0:
        return rif
    return jnp.concatenate(
        [rif, jnp.broadcast_to(rif[-1:], (extra,) + rif.shape[1:])], axis=0)


def _build_local_slab(rif_local, halo_prev, first_dev, res, S):
    """Device-local cell-table slab from this device's voxel z-rows.

    ``rif_local``: (S, res, res) — voxel rows [z0, z0+S) of the z-padded
    volume.  ``halo_prev``: (res, res) — the previous device's last voxel
    row (= global row z0-1); on device 0 the caller passes this device's own
    row 0 (the z=0 edge clamp).  Returns (S*(res+1)^2, 8) rows in exactly
    the layout of :func:`build_slab_tables`.

    This is the production build path: no device ever materializes the full
    cell table or the full voxel grid (VERDICT r4 #4)."""
    zblock = jnp.concatenate(
        [jnp.where(first_dev, rif_local[:1], halo_prev[None]), rif_local],
        axis=0)  # (S+1, res, res); zblock[j] == padded-volume P[z0 + j]
    zb = jnp.pad(zblock, ((0, 0), (1, 1), (1, 1)), mode="edge")
    corners = []
    for c in range(2):
        for b in range(2):
            for a in range(2):
                corners.append(
                    lax.slice(zb, (c, b, a), (c + S, b + res + 1,
                                              a + res + 1)))
    table = jnp.stack(corners, axis=-1)  # (S, res+1, res+1, 8)
    return table.reshape(S * (res + 1) * (res + 1), 8)


def _fold_local_slab_grad(gslab, first_dev, res, S):
    """Transpose of _build_local_slab: fold cell-row grads back to voxel
    rows.  Returns (gvox_local (S, res, res), boundary (res, res)) where
    ``boundary`` is the contribution to global voxel row z0-1 (owned by the
    PREVIOUS device; the caller ppermutes it back and adds, except on
    device 0 where it belongs to this device's own row 0)."""
    cg = gslab.reshape(S, res + 1, res + 1, 8)
    gzb = jnp.zeros((S + 1, res + 2, res + 2), dtype=gslab.dtype)
    k = 0
    for c in range(2):
        for b in range(2):
            for a in range(2):
                gzb = lax.dynamic_update_slice(
                    gzb,
                    lax.dynamic_slice(gzb, (c, b, a), (S, res + 1, res + 1))
                    + cg[..., k],
                    (c, b, a))
                k += 1
    # collapse the x/y edge padding (edge-pad transpose, fields/cells.py)
    def collapse(axis, arr):
        n = arr.shape[axis]
        first = lax.index_in_dim(arr, 0, axis, keepdims=False)
        last = lax.index_in_dim(arr, n - 1, axis, keepdims=False)
        core = lax.slice_in_dim(arr, 1, n - 1, axis=axis)
        idx0 = [slice(None)] * core.ndim
        idx0[axis] = 0
        idxl = [slice(None)] * core.ndim
        idxl[axis] = core.shape[axis] - 1
        core = core.at[tuple(idx0)].add(first)
        core = core.at[tuple(idxl)].add(last)
        return core

    gzb = collapse(2, collapse(1, gzb))  # (S+1, res, res)
    boundary = jnp.where(first_dev, 0.0, gzb[0])
    gvox = gzb[1:]
    gvox = gvox.at[0].add(jnp.where(first_dev, gzb[0], 0.0))
    return gvox, boundary


def _local_fetch(slab, z0, S, res, h, x, mask):
    """Row gather restricted to the held slab.

    Returns (vals (N,8), w0, local_ci, in_slab).  Lanes whose cell z-row is
    outside [z0, z0+S) read zeros and report in_slab=False.
    """
    cf = CT.CellField(None, h, (res, res, res))
    rowlen = (res + 1) * (res + 1)
    ci_flat, w0 = CT.cell_index(cf, x)
    cz = ci_flat // rowlen
    in_slab = (cz >= z0) & (cz < z0 + S)
    local = jnp.clip(ci_flat - z0 * rowlen, 0, S * rowlen - 1)
    vals = slab.at[local].get(mode="promise_in_bounds")
    m = in_slab if mask is None else (mask & in_slab)
    vals = jnp.where(m[:, None], vals, 0.0)
    return vals, w0, local, in_slab


def make_slab_trace_zsharded(mesh: Mesh, h: float, ds: float, res: int,
                             inner_steps: int | None = None,
                             phase_slack: int = 2, variant: str = "plain"):
    """Differentiable slab-sharded trace built from Z-SHARDED voxel data.

    The production >HBM path (VERDICT r4 #4): ``traced(rif_z, x, v)`` (or
    ``traced(rif_z, x, v, pln_o, pln_d)`` for ``variant='plane'``) where
    ``rif_z = pad_rif_z(rif, ndev)`` is sharded P('rays', None, None) along
    z.  Each device builds ONLY its own cell-table slab from its local
    voxel rows plus a one-plane halo ppermute — no device ever holds the
    full cell table, the full voxel grid, or the full gradient
    (tests/test_slabs.py asserts the compiled per-device footprint).  The
    returned gradient is z-sharded like ``rif_z``; differentiating through
    :func:`pad_rif_z` folds the padded rows into the boundary plane.

    Ring semantics are those of :func:`make_slab_trace` (same inner loops);
    lanes that exhaust the phase budget (``phase_slack`` extra ring
    revolutions) are NaN-poisoned so truncation fails loudly instead of
    silently returning a short trace (ADVICE r4)."""
    ndev = mesh.devices.size
    steps_f = E.max_steps_fwd(res, h, ds)
    steps_b = E.max_steps_bwd(res, h, ds)
    S = slab_rows(res + 1, ndev)
    K = inner_steps or max(int(S * float(h) / float(ds)) * 2, 8)
    ray_spec = P("rays", None)
    rif_spec = P("rays", None, None)
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    perm_back = [(i, (i - 1) % ndev) for i in range(ndev)]
    plane = variant == "plane"
    if variant not in ("plain", "plane"):  # pragma: no cover
        raise ValueError(variant)

    def _phases(max_steps):
        return ndev * (-(-max_steps // K) + phase_slack)

    def _slab_here(rif_local):
        me = lax.axis_index("rays")
        halo = lax.ppermute(rif_local[-1], "rays", perm)
        return _build_local_slab(rif_local, halo, me == 0, res, S)

    def _cur_inside(dummy, x2, po, pd):
        inb = G.inbounds(dummy, x2)
        if not plane:
            return inb
        past = jnp.einsum("nd,nd->n", x2 - po, pd) > 0
        return inb & ~past

    def _fwd_local(rif_local, x, v, *pln):
        slab = _slab_here(rif_local)
        po, pd = pln if plane else (None, None)
        dummy = GridField(jnp.zeros((res,) * 3, x.dtype), h)
        dsx = jnp.asarray(ds, dtype=x.dtype)
        me = lax.axis_index("rays").astype(jnp.int32)

        inside0 = G.inbounds(dummy, x)
        esc0 = jnp.zeros_like(inside0)
        cnt0 = lax.pcast(jnp.zeros(x.shape[0], jnp.int32), "rays",
                         to="varying")

        def inner(s):
            slab, z0, x, v, xt, vt, inside, esc, cnt = s

            def body(_, t):
                x, v, xt, vt, inside, esc, cnt = t
                vals, w0, _, in_slab = _local_fetch(
                    slab, z0, S, res, h, x, inside)
                act = in_slab & ~esc & (cnt < steps_f)
                nv, nx = CT.eval_grad_from(vals, w0, h)
                v2 = v + (dsx * nv)[:, None] * nx
                x2 = x + dsx * v2
                cur_inside = _cur_inside(dummy, x2, po, pd)
                cross = inside & ~cur_inside
                esc2 = esc | cross | G.escaped(dummy, x2, v2)
                xt2 = _where3(cross, x2, xt)
                vt2 = _where3(cross, v2, vt)
                x = _where3(act, x2, x)
                v = _where3(act, v2, v)
                xt = _where3(act, xt2, xt)
                vt = _where3(act, vt2, vt)
                inside = jnp.where(act, cur_inside, inside)
                esc = jnp.where(act, esc2, esc)
                cnt = cnt + act.astype(jnp.int32)
                return (x, v, xt, vt, inside, esc, cnt)

            out = lax.fori_loop(0, K, body,
                                (x, v, xt, vt, inside, esc, cnt))
            return (slab, z0) + out

        def phase(carry, _):
            slab, z0, x, v, xt, vt, inside, esc, cnt, done = carry
            slab, z0, x, v, xt, vt, inside, esc, cnt = lax.cond(
                done, lambda s: s, inner,
                (slab, z0, x, v, xt, vt, inside, esc, cnt))
            slab = lax.ppermute(slab, "rays", perm)
            z0 = lax.ppermute(z0, "rays", perm)
            pending = (~esc) & (cnt < steps_f)
            done = lax.psum(pending.any().astype(jnp.int32), "rays") == 0
            return (slab, z0, x, v, xt, vt, inside, esc, cnt, done), None

        z0 = me * S
        (slab, z0, x, v, xt, vt, inside, esc, cnt, _), _ = lax.scan(
            phase, (slab, z0, x, v, x, v, inside0, esc0, cnt0,
                    jnp.zeros((), bool)), None, length=_phases(steps_f))
        # failed-to-exit fixup (tracer.cpp:89-96)
        xt = _where3(esc, xt, x)
        # phase-budget exhaustion: a lane still pending here was truncated —
        # poison it so the caller sees NaNs, not silently-wrong outputs
        # (ADVICE r4: a ray oscillating across a slab boundary can exhaust
        # the +phase_slack budget with cnt < max_steps and esc false)
        pending = (~esc) & (cnt < steps_f)
        xt = jnp.where(pending[:, None], jnp.nan, xt)
        vt = jnp.where(pending[:, None], jnp.nan, vt)
        if plane:
            return xt, vt, ~esc
        return xt, vt

    fwd_in = (rif_spec, ray_spec, ray_spec) + (
        (ray_spec, ray_spec) if plane else ())
    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=fwd_in,
        out_specs=(ray_spec, ray_spec) + ((P("rays"),) if plane else ()),
    )

    def _bwd_local(rif_local, xt, vt, dxt, dvt):
        slab = _slab_here(rif_local)
        dummy = GridField(jnp.zeros((res,) * 3, xt.dtype), h)
        dsx = jnp.asarray(ds, dtype=xt.dtype)
        me = lax.axis_index("rays").astype(jnp.int32)

        la0 = dxt
        mu0 = dvt + dsx * dxt
        active0 = ~G.escaped(dummy, xt, -vt)
        gslab0 = jnp.zeros_like(slab)
        cnt0 = lax.pcast(jnp.zeros(xt.shape[0], jnp.int32), "rays",
                         to="varying")

        def inner(s):
            slab, gslab, z0, x, v, la, mu, active, cnt = s

            def body(_, t):
                x, v, la, mu, active, cnt, gslab = t
                xr = x - dsx * v
                xe = G.snap_to_nodes(xr, h)
                inb = G.inbounds(dummy, xe)
                vals, w0, local, in_slab = _local_fetch(
                    slab, z0, S, res, h, xe, active & inb)
                act = in_slab & active & (cnt < steps_b)
                nv, nx = CT.eval_grad_from(vals, w0, h)
                hess = CT.eval_hess_from(vals, w0, h)
                v2 = v - (dsx * nv)[:, None] * nx
                active2 = act & ~G.escaped(dummy, xe, -v2)

                dn = jnp.einsum("nd,nd->n", mu, nx)
                dnx = nv[:, None] * mu
                contrib = CT.splat_rows(w0, dn * dsx, dnx * dsx, h,
                                        mask=act & active2 & inb)
                gslab = gslab.at[local].add(
                    jnp.where(act[:, None], contrib, 0.0),
                    mode="promise_in_bounds")

                la2 = la + dsx * (dn[:, None] * nx
                                  + nv[:, None] * G.hess_matvec(hess, mu))
                mu2 = mu + dsx * la2
                x = _where3(act, xr, x)
                v = _where3(act, v2, v)
                la = _where3(act, la2, la)
                mu = _where3(act, mu2, mu)
                active = jnp.where(act, active2, active)
                cnt = cnt + act.astype(jnp.int32)
                return (x, v, la, mu, active, cnt, gslab)

            x, v, la, mu, active, cnt, gslab = lax.fori_loop(
                0, K, body, (x, v, la, mu, active, cnt, gslab))
            return (slab, gslab, z0, x, v, la, mu, active, cnt)

        def phase(carry, _):
            (slab, gslab, z0, x, v, la, mu, active, cnt, done) = carry
            slab, gslab, z0, x, v, la, mu, active, cnt = lax.cond(
                done, lambda s: s, inner,
                (slab, gslab, z0, x, v, la, mu, active, cnt))
            slab = lax.ppermute(slab, "rays", perm)
            gslab = lax.ppermute(gslab, "rays", perm)
            z0 = lax.ppermute(z0, "rays", perm)
            pending = active & (cnt < steps_b)
            done = lax.psum(pending.any().astype(jnp.int32), "rays") == 0
            return (slab, gslab, z0, x, v, la, mu, active, cnt, done), None

        z0 = me * S
        nphase = _phases(steps_b)
        (slab, gslab, z0, x, v, la, mu, active, cnt, _), _ = lax.scan(
            phase, (slab, gslab0, z0, xt, vt, la0, mu0, active0, cnt0,
                    jnp.zeros((), bool)), None, length=nphase)
        for _ in range((-nphase) % ndev):
            gslab = lax.ppermute(gslab, "rays", perm)
        # truncated adjoint sweep -> poison the gradient loudly (ADVICE r4)
        pending = active & (cnt < steps_b)
        bad = lax.psum(pending.any().astype(jnp.int32), "rays") > 0
        gslab = gslab + jnp.where(bad, jnp.nan, 0.0)

        gvox, boundary = _fold_local_slab_grad(gslab, me == 0, res, S)
        recv = lax.ppermute(boundary, "rays", perm_back)
        # device d receives the boundary contribution of device d+1, which
        # belongs to d's LAST voxel row (global row z0(d+1)-1 = z0(d)+S-1);
        # the wrap-around receive on the last device is device 0's
        # boundary, which device 0 already folded into its own row 0 (it
        # sends zeros there), so the add is a no-op by construction
        gvox = gvox.at[-1].add(recv)
        return gvox

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(rif_spec, ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=rif_spec,
    )

    if plane:
        @jax.custom_vjp
        def traced(rif_z, x, v, po, pd):
            return fwd_sharded(rif_z, x, v, po, pd)

        def traced_fwd(rif_z, x, v, po, pd):
            out = fwd_sharded(rif_z, x, v, po, pd)
            xt, vt, miss = out
            return out, (rif_z, xt, vt, miss, po, pd)

        def traced_bwd(res_ck, cts):
            rif_z, xt, vt, miss, po, pd = res_ck
            dxt, dvt, _ = cts
            dxt = jnp.where(miss[:, None], 0.0, dxt)
            g = bwd_sharded(rif_z, xt, vt, dxt, dvt)
            z = jnp.zeros_like(xt)
            return g, z, z, jnp.zeros_like(po), jnp.zeros_like(pd)

        traced.defvjp(traced_fwd, traced_bwd)
        return traced

    @jax.custom_vjp
    def traced(rif_z, x, v):
        return fwd_sharded(rif_z, x, v)

    def traced_fwd(rif_z, x, v):
        out = fwd_sharded(rif_z, x, v)
        return out, (rif_z, out[0], out[1])

    def traced_bwd(res_ck, cts):
        rif_z, xt, vt = res_ck
        dxt, dvt = cts
        g = bwd_sharded(rif_z, xt, vt, dxt, dvt)
        return g, jnp.zeros_like(xt), jnp.zeros_like(vt)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced


def make_slab_trace(mesh: Mesh, h: float, ds: float, res: int,
                    inner_steps: int | None = None):
    """Differentiable ``trace(rif, x, v)`` with the grid z-slab-sharded.

    rif is passed full (prototype); internally each device addresses only
    its rotating slab.  Rays are sharded over the same 1D axis ("rays").
    Outputs and gradients match ``tracer.trace``.
    """
    ndev = mesh.devices.size
    steps_f = E.max_steps_fwd(res, h, ds)
    steps_b = E.max_steps_bwd(res, h, ds)
    S = slab_rows(res + 1, ndev)
    K = inner_steps or max(int(S * float(h) / float(ds)) * 2, 8)
    ray_spec = P("rays", None)
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def _phases(max_steps):
        # every revolution (ndev phases) gives each lane >= K steps in its
        # current slab; +2 revolutions absorb crossing waits.  The done
        # flag skips the tail, this is just the static bound.
        return ndev * (-(-max_steps // K) + 2)

    def _fwd_local(slabs, x, v):
        slab = slabs[0]
        dummy = GridField(jnp.zeros((res,) * 3, x.dtype), h)
        dsx = jnp.asarray(ds, dtype=x.dtype)
        me = lax.axis_index("rays").astype(jnp.int32)

        inside0 = G.inbounds(dummy, x)
        esc0 = jnp.zeros_like(inside0)
        cnt0 = lax.pcast(jnp.zeros(x.shape[0], jnp.int32), "rays",
                         to="varying")

        def inner(s):
            slab, z0, x, v, xt, vt, inside, esc, cnt = s

            def body(_, t):
                x, v, xt, vt, inside, esc, cnt = t
                vals, w0, _, in_slab = _local_fetch(
                    slab, z0, S, res, h, x, inside)
                act = in_slab & ~esc & (cnt < steps_f)
                nv, nx = CT.eval_grad_from(vals, w0, h)
                v2 = v + (dsx * nv)[:, None] * nx
                x2 = x + dsx * v2
                cur_inside = G.inbounds(dummy, x2)
                cross = inside & ~cur_inside
                esc2 = esc | cross | G.escaped(dummy, x2, v2)
                xt2 = _where3(cross, x2, xt)
                vt2 = _where3(cross, v2, vt)
                x = _where3(act, x2, x)
                v = _where3(act, v2, v)
                xt = _where3(act, xt2, xt)
                vt = _where3(act, vt2, vt)
                inside = jnp.where(act, cur_inside, inside)
                esc = jnp.where(act, esc2, esc)
                cnt = cnt + act.astype(jnp.int32)
                return (x, v, xt, vt, inside, esc, cnt)

            out = lax.fori_loop(0, K, body,
                                (x, v, xt, vt, inside, esc, cnt))
            return (slab, z0) + out

        def phase(carry, _):
            slab, z0, x, v, xt, vt, inside, esc, cnt, done = carry
            slab, z0, x, v, xt, vt, inside, esc, cnt = lax.cond(
                done, lambda s: s, inner,
                (slab, z0, x, v, xt, vt, inside, esc, cnt))
            slab = lax.ppermute(slab, "rays", perm)
            z0 = lax.ppermute(z0, "rays", perm)
            pending = (~esc) & (cnt < steps_f)
            done = lax.psum(pending.any().astype(jnp.int32), "rays") == 0
            return (slab, z0, x, v, xt, vt, inside, esc, cnt, done), None

        z0 = me * S
        (slab, z0, x, v, xt, vt, inside, esc, cnt, _), _ = lax.scan(
            phase, (slab, z0, x, v, x, v, inside0, esc0, cnt0,
                    jnp.zeros((), bool)), None, length=_phases(steps_f))
        # failed-to-exit fixup (tracer.cpp:89-96)
        xt = _where3(esc, xt, x)
        # phase-budget exhaustion -> NaN-poison, never silent truncation
        # (ADVICE r4: slab-boundary oscillation can exhaust the +2
        # revolutions with cnt < max_steps and esc false)
        pending = (~esc) & (cnt < steps_f)
        xt = jnp.where(pending[:, None], jnp.nan, xt)
        vt = jnp.where(pending[:, None], jnp.nan, vt)
        return xt, vt

    fwd_sharded = shard_map(
        _fwd_local, mesh=mesh,
        in_specs=(P("rays"), ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec),
    )

    def _bwd_local(slabs, xt, vt, dxt, dvt):
        slab = slabs[0]
        dummy = GridField(jnp.zeros((res,) * 3, xt.dtype), h)
        dsx = jnp.asarray(ds, dtype=xt.dtype)
        me = lax.axis_index("rays").astype(jnp.int32)

        la0 = dxt
        mu0 = dvt + dsx * dxt
        active0 = ~G.escaped(dummy, xt, -vt)
        gslab0 = jnp.zeros_like(slab)
        cnt0 = lax.pcast(jnp.zeros(xt.shape[0], jnp.int32), "rays",
                         to="varying")

        def inner(s):
            slab, gslab, z0, x, v, la, mu, active, cnt = s

            def body(_, t):
                x, v, la, mu, active, cnt, gslab = t
                xr = x - dsx * v
                xe = G.snap_to_nodes(xr, h)
                inb = G.inbounds(dummy, xe)
                vals, w0, local, in_slab = _local_fetch(
                    slab, z0, S, res, h, xe, active & inb)
                act = in_slab & active & (cnt < steps_b)
                nv, nx = CT.eval_grad_from(vals, w0, h)
                hess = CT.eval_hess_from(vals, w0, h)
                v2 = v - (dsx * nv)[:, None] * nx
                active2 = act & ~G.escaped(dummy, xe, -v2)

                dn = jnp.einsum("nd,nd->n", mu, nx)
                dnx = nv[:, None] * mu
                contrib = CT.splat_rows(w0, dn * dsx, dnx * dsx, h,
                                        mask=act & active2 & inb)
                gslab = gslab.at[local].add(
                    jnp.where(act[:, None], contrib, 0.0),
                    mode="promise_in_bounds")

                la2 = la + dsx * (dn[:, None] * nx
                                  + nv[:, None] * G.hess_matvec(hess, mu))
                mu2 = mu + dsx * la2
                x = _where3(act, xr, x)
                v = _where3(act, v2, v)
                la = _where3(act, la2, la)
                mu = _where3(act, mu2, mu)
                active = jnp.where(act, active2, active)
                cnt = cnt + act.astype(jnp.int32)
                return (x, v, la, mu, active, cnt, gslab)

            x, v, la, mu, active, cnt, gslab = lax.fori_loop(
                0, K, body, (x, v, la, mu, active, cnt, gslab))
            return (slab, gslab, z0, x, v, la, mu, active, cnt)

        def phase(carry, _):
            (slab, gslab, z0, x, v, la, mu, active, cnt, done) = carry
            slab, gslab, z0, x, v, la, mu, active, cnt = lax.cond(
                done, lambda s: s, inner,
                (slab, gslab, z0, x, v, la, mu, active, cnt))
            slab = lax.ppermute(slab, "rays", perm)
            gslab = lax.ppermute(gslab, "rays", perm)
            z0 = lax.ppermute(z0, "rays", perm)
            pending = active & (cnt < steps_b)
            done = lax.psum(pending.any().astype(jnp.int32), "rays") == 0
            return (slab, gslab, z0, x, v, la, mu, active, cnt, done), None

        z0 = me * S
        nphase = _phases(steps_b)
        (slab, gslab, z0, x2, v2, la, mu, active, cnt, _), _ = lax.scan(
            phase, (slab, gslab0, z0, xt, vt, la0, mu0, active0, cnt0,
                    jnp.zeros((), bool)), None, length=nphase)
        # slab d's grad sits on device (d + nphase) % ndev; rotate the
        # remaining hops so it lands back on device d (out spec P('rays'))
        for _ in range((-nphase) % ndev):
            gslab = lax.ppermute(gslab, "rays", perm)
        # truncated adjoint sweep -> poison the gradient loudly (ADVICE r4)
        pending = active & (cnt < steps_b)
        bad = lax.psum(pending.any().astype(jnp.int32), "rays") > 0
        gslab = gslab + jnp.where(bad, jnp.nan, 0.0)
        return gslab[None]

    bwd_sharded = shard_map(
        _bwd_local, mesh=mesh,
        in_specs=(P("rays"), ray_spec, ray_spec, ray_spec, ray_spec),
        out_specs=P("rays"),
    )

    def _tables(rif):
        slabs, _ = build_slab_tables(GridField(rif, h), ndev)
        return slabs

    @jax.custom_vjp
    def traced(rif, x, v):
        return fwd_sharded(_tables(rif), x, v)

    def traced_fwd(rif, x, v):
        out = fwd_sharded(_tables(rif), x, v)
        return out, (rif, out[0], out[1])

    def traced_bwd(res_ck, cts):
        rif, xt, vt = res_ck
        dxt, dvt = cts
        gslabs = bwd_sharded(_tables(rif), xt, vt, dxt, dvt)
        # fold the slab cell-grads back into the voxel gradient
        field = GridField(rif, h)
        cf = CT.build_cell_table(field)
        d1, h1, w1, _ = cf.table.shape
        rows = gslabs.reshape(-1, 8)[: d1 * h1 * w1]
        g = CT.fold_cell_grad(rows, cf)
        return g.reshape(rif.shape), jnp.zeros_like(xt), jnp.zeros_like(vt)

    traced.defvjp(traced_fwd, traced_bwd)
    return traced

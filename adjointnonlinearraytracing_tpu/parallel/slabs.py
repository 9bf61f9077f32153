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
at D=8, 1.1 GB at D=32 — vs 34 GB replicated.  This is the validated
prototype of SURVEY §2.3's grid-sharding row; production deployment needs
only K tuning and building each slab from z-sharded voxel data (+1 halo
row) instead of the host-side full-table build used here.

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
        (slab, gslab, z0, *_), _ = lax.scan(
            phase, (slab, gslab0, z0, xt, vt, la0, mu0, active0, cnt0,
                    jnp.zeros((), bool)), None, length=nphase)
        # slab d's grad sits on device (d + nphase) % ndev; rotate the
        # remaining hops so it lands back on device d (out spec P('rays'))
        for _ in range((-nphase) % ndev):
            gslab = lax.ppermute(gslab, "rays", perm)
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

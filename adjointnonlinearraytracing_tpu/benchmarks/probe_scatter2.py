"""Probe: adjoint scatter strategies at 128^3 / 262k rays (round 2).

Times the backward sweep in isolation for:
  super   — per-substep (N, 128) supercell rows (round-1 committed path)
  window  — per-PAIR (N, 64) window rows into the (ext^3, 64) node table
  nosct   — window math with the scatter replaced by a row reduce
            (isolates loop math + gather cost from the scatter cost)

Run on the real chip:  python -m adjointnonlinearraytracing_tpu.benchmarks.probe_scatter2
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

from adjointnonlinearraytracing_tpu.benchmarks.scenes import build_case
from adjointnonlinearraytracing_tpu.fields import cells as CT
from adjointnonlinearraytracing_tpu.fields import grid as G
from adjointnonlinearraytracing_tpu.fields import windows as WD
from adjointnonlinearraytracing_tpu.tracer import paired as PD
from adjointnonlinearraytracing_tpu.tracer import eikonal as E


def backtrace_super(field, xt, vt, dx, dv, ds, max_steps):
    """Round-1 committed adjoint: per-substep supercell scatter."""
    wf = WD.build_window_table(field)
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    g0 = WD.zero_super_grad(wf, xt.dtype)

    def substep(W, ci3_a, x, v, la, mu, active, g, valid):
        x2 = x - ds * v
        xe = G.snap_to_nodes(x2, field.h)
        emask = active & G.inbounds(field, xe)
        ci3, w0 = WD.cell_index3(wf, xe)
        off3 = 1 if ci3_a is None else WD.window_offsets(ci3_a, ci3)
        n, nx, hess = WD.eval_window(W, off3, w0, field.h, mask=emask,
                                     want_hess=True)
        v2 = v - (ds * n)[:, None] * nx
        active2 = active & ~G.escaped(field, xe, -v2)
        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        contrib = CT.splat_rows(w0, dn * ds, dnx * ds, field.h,
                                mask=active2 & emask)
        if valid is not None:
            contrib = jnp.where(valid, contrib, 0.0)
        g2 = WD.scatter_super(wf, g, ci3, contrib)
        la2 = la + ds * (dn[:, None] * nx
                         + n[:, None] * G.hess_matvec(hess, mu))
        mu2 = mu + ds * la2
        if valid is not None:
            x2 = jnp.where(valid, x2, x)
            v2 = jnp.where(valid, v2, v)
            la2 = jnp.where(valid, la2, la)
            mu2 = jnp.where(valid, mu2, mu)
            active2 = jnp.where(valid, active2, active)
        return x2, v2, la2, mu2, active2, g2

    def cond(s):
        step, *_, active, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, g = s
        xa = G.snap_to_nodes(x - ds * v, field.h)
        ci3_a, _ = WD.cell_index3(wf, xa)
        W = wf.table.at[WD.flatten_ci3(wf, ci3_a)].get(
            mode="promise_in_bounds")
        x, v, la, mu, active, g = substep(
            W, None, x, v, la, mu, active, g, None)
        x, v, la, mu, active, g = substep(
            W, ci3_a, x, v, la, mu, active, g, step + 1 < max_steps)
        return (step + 2, x, v, la, mu, active, g)

    _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, g0))
    return WD.fold_super_grad(g, wf).reshape(-1)


def backtrace_window_nosct(field, xt, vt, dx, dv, ds, max_steps):
    """Window-path math with the scatter replaced by a cheap row-sum."""
    wf = WD.build_window_table(field)
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    acc0 = jnp.zeros((64,), dtype=xt.dtype)

    def cond(s):
        step, *_, active, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, acc = s
        xa = G.snap_to_nodes(x - ds * v, field.h)
        ci3_a, _ = WD.cell_index3(wf, xa)
        row_a = WD.flatten_ci3(wf, ci3_a)
        W = wf.table.at[row_a].get(mode="promise_in_bounds")
        sub = PD.backtrace.__wrapped__ if hasattr(PD.backtrace, "__wrapped__") \
            else None
        # inline the two substeps (same code as PD.backtrace)
        def substep(W, ci3_a, x, v, la, mu, active, valid):
            x2 = x - ds * v
            xe = G.snap_to_nodes(x2, field.h)
            emask = active & G.inbounds(field, xe)
            ci3, w0 = WD.cell_index3(wf, xe)
            off3 = 1 if ci3_a is None else WD.window_offsets(ci3_a, ci3)
            n, nx, hess, pat = WD.eval_window(
                W, off3, w0, field.h, mask=emask, want_hess=True,
                want_patterns=True)
            v2 = v - (ds * n)[:, None] * nx
            active2 = active & ~G.escaped(field, xe, -v2)
            dn = jnp.einsum("nd,nd->n", mu, nx)
            dnx = n[:, None] * mu
            cw = WD.window_contrib(pat, dn * ds, dnx * ds, field.h,
                                   mask=active2 & emask)
            if valid is not None:
                cw = jnp.where(valid, cw, 0.0)
            la2 = la + ds * (dn[:, None] * nx
                             + n[:, None] * G.hess_matvec(hess, mu))
            mu2 = mu + ds * la2
            if valid is not None:
                x2 = jnp.where(valid, x2, x)
                v2 = jnp.where(valid, v2, v)
                la2 = jnp.where(valid, la2, la)
                mu2 = jnp.where(valid, mu2, mu)
                active2 = jnp.where(valid, active2, active)
            return x2, v2, la2, mu2, active2, cw

        x, v, la, mu, active, cw1 = substep(W, None, x, v, la, mu, active,
                                            None)
        x, v, la, mu, active, cw2 = substep(W, ci3_a, x, v, la, mu, active,
                                            step + 1 < max_steps)
        acc = acc + jnp.sum(cw1 + cw2, axis=0)
        return (step + 2, x, v, la, mu, active, acc)

    _, _, _, _, _, _, acc = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, acc0))
    return acc


def main():
    res, nrays = 128, 1 << 18
    rif, x0, v0, span = build_case(res=res, nrays=nrays)
    h = span / (res - 1)
    ds = h / 2
    field = G.GridField(rif, h)
    steps_fwd = E.max_steps_fwd(res, h, ds)
    steps_bwd = E.max_steps_bwd(res, h, ds)

    fwd = jax.jit(lambda r, x, v: PD.trace(G.GridField(r, h), x, v, ds,
                                           steps_fwd))
    xt, vt = jax.block_until_ready(fwd(rif, x0, v0))
    dx = jnp.ones_like(xt)
    dv = jnp.ones_like(vt)

    def _sync(out):
        # block_until_ready does not reliably wait on this backend for some
        # executables; a host transfer does.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    def timeit(name, fn, *argsets):
        # distinct (2%-scaled) fields + host-transfer sync per call
        _sync(fn(*argsets[0]))  # compile+warm
        times = []
        for a in argsets[1:]:
            t0 = time.perf_counter()
            _sync(fn(*a))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{name:28s} {dt * 1e3:9.1f} ms/iter"
              f"  ({nrays / dt / 1e3:8.1f} k rays/s)")
        return dt

    rifs = [jax.block_until_ready(rif * (1.0 + 2e-2 * i)) for i in range(4)]
    timeit("forward (paired)", fwd, *[(r, x0, v0) for r in rifs])
    bt_sup = jax.jit(lambda r, *a: backtrace_super(G.GridField(r, h), *a,
                                                   ds, steps_bwd))
    bt_win = jax.jit(lambda r, *a: PD.backtrace(G.GridField(r, h), *a,
                                                ds, steps_bwd))
    bt_nos = jax.jit(lambda r, *a: backtrace_window_nosct(
        G.GridField(r, h), *a, ds, steps_bwd))
    bsets = [(r, xt, vt, dx, dv) for r in rifs]
    timeit("bwd super (r1 committed)", bt_sup, *bsets)
    timeit("bwd window (new)", bt_win, *bsets)
    timeit("bwd window no-scatter", bt_nos, *bsets)


if __name__ == "__main__":
    main()

"""Paired-step eikonal steppers on the snapped-window formulation.

Numerically equivalent to tracer/fast.py (same per-step math, masks, exit
capture — asserted by tests/test_paired.py) but each loop iteration performs
TWO integration substeps from ONE (N, 125) window gather, and the adjoint
issues ONE (N, 125) window-row scatter per pair (both substeps' splats land
on the same snapped window; fields/windows.py has the design + measurements).

Validity: the window covers both substeps only when the per-step per-axis
movement ``ds * |v| = ds * n`` stays <= h.  tracer/api.py selects this path
when ``ds <= h/2`` (covers every reference experiment, all of which keep
n <= sqrt(2)); otherwise the classic cell-table path runs.

Reference parity anchors: forward step math tracer.cpp:68-71; exit capture
:73-87; adjoint lambda/mu sweep tracer.cpp:384-440 (mu0 = dv + ds*dx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import cells as CT
from ..fields import grid as G
from ..fields import windows as WD


def _where3(m, a, b):
    return jnp.where(m[:, None], a, b)


def _substep_fwd(field, wf, W, a3, ci3, x, v, xt, vt, inside, esc, ds,
                 valid):
    """One forward substep evaluated from an already-gathered window.

    ``ci3`` is the eval cell when known (first substep, saves recomputing);
    None for the second substep.
    """
    if ci3 is None:
        ci3, w0 = WD.cell_index3(wf, x)
    else:
        _, w0 = WD.cell_index3(wf, x)
    off3 = ci3 - a3
    n, nx = WD.eval_nx(W, off3, w0, field.h, mask=inside)
    v2 = v + (ds * n)[:, None] * nx
    x2 = x + ds * v2

    cur_inside = G.inbounds(field, x2)
    cross = inside & ~cur_inside
    esc2 = esc | cross | G.escaped(field, x2, v2)
    xt2 = _where3(cross, x2, xt)
    vt2 = _where3(cross, v2, vt)
    if valid is not None:
        x2 = jnp.where(valid, x2, x)
        v2 = jnp.where(valid, v2, v)
        xt2 = jnp.where(valid, xt2, xt)
        vt2 = jnp.where(valid, vt2, vt)
        cur_inside = jnp.where(valid, cur_inside, inside)
        esc2 = jnp.where(valid, esc2, esc)
    return x2, v2, xt2, vt2, cur_inside, esc2


def trace(field: G.GridField, x0, v0, ds, max_steps: int):
    wf = WD.build_window_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        W, a3, ci3, _ = WD.fetch_window(wf, x)
        x, v, xt, vt, inside, esc = _substep_fwd(
            field, wf, W, a3, ci3, x, v, xt, vt, inside, esc, ds, None)
        x, v, xt, vt, inside, esc = _substep_fwd(
            field, wf, W, a3, None, x, v, xt, vt, inside, esc, ds,
            step + 1 < max_steps)
        return (step + 2, x, v, xt, vt, inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))
    xt = _where3(esc, xt, x)
    return xt, vt


def trace_plane(field: G.GridField, x0, v0, pln_o, pln_d, ds, max_steps: int):
    wf = WD.build_window_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def substep(W, a3, ci3, x, v, xt, vt, inside, esc, valid):
        if ci3 is None:
            ci3, w0 = WD.cell_index3(wf, x)
        else:
            _, w0 = WD.cell_index3(wf, x)
        off3 = ci3 - a3
        n, nx = WD.eval_nx(W, off3, w0, field.h, mask=inside)
        v2 = v + (ds * n)[:, None] * nx
        x2 = x + ds * v2

        past_pln = jnp.einsum("nd,nd->n", x2 - pln_o, pln_d) > 0
        cur_inside = G.inbounds(field, x2) & ~past_pln
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)
        xt2 = _where3(cross, x2, xt)
        vt2 = _where3(cross, v2, vt)
        if valid is not None:
            x2 = jnp.where(valid, x2, x)
            v2 = jnp.where(valid, v2, v)
            xt2 = jnp.where(valid, xt2, xt)
            vt2 = jnp.where(valid, vt2, vt)
            cur_inside = jnp.where(valid, cur_inside, inside)
            esc2 = jnp.where(valid, esc2, esc)
        return x2, v2, xt2, vt2, cur_inside, esc2

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        W, a3, ci3, _ = WD.fetch_window(wf, x)
        x, v, xt, vt, inside, esc = substep(
            W, a3, ci3, x, v, xt, vt, inside, esc, None)
        x, v, xt, vt, inside, esc = substep(
            W, a3, None, x, v, xt, vt, inside, esc, step + 1 < max_steps)
        return (step + 2, x, v, xt, vt, inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))
    xt = _where3(esc, xt, x)
    return xt, vt, ~esc


def trace_target(field: G.GridField, x0, v0, target, ds, max_steps: int):
    wf = WD.build_window_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def substep(W, a3, ci3, x, v, xt, vt, d2, inside, esc, valid):
        if ci3 is None:
            ci3, w0 = WD.cell_index3(wf, x)
        else:
            _, w0 = WD.cell_index3(wf, x)
        off3 = ci3 - a3
        n, nx = WD.eval_nx(W, off3, w0, field.h, mask=inside)
        v2 = v + (ds * n)[:, None] * nx
        x2 = x + ds * v2

        cur_d2 = jnp.sum((x2 - target) ** 2, axis=-1)
        closer = cur_d2 < d2

        cur_inside = G.inbounds(field, x2)
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)

        xt2 = _where3(closer, x2, xt)
        vt2 = _where3(closer, v2, vt)
        d2n = jnp.where(closer, cur_d2, d2)
        if valid is not None:
            x2 = jnp.where(valid, x2, x)
            v2 = jnp.where(valid, v2, v)
            xt2 = jnp.where(valid, xt2, xt)
            vt2 = jnp.where(valid, vt2, vt)
            d2n = jnp.where(valid, d2n, d2)
            cur_inside = jnp.where(valid, cur_inside, inside)
            esc2 = jnp.where(valid, esc2, esc)
        return x2, v2, xt2, vt2, d2n, cur_inside, esc2

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, d2, inside, esc = s
        W, a3, ci3, _ = WD.fetch_window(wf, x)
        x, v, xt, vt, d2, inside, esc = substep(
            W, a3, ci3, x, v, xt, vt, d2, inside, esc, None)
        # the second substep must also respect the per-step stop conditions:
        # the reference's while loop re-checks all(escaped) between steps, and
        # the target variant keeps capturing ballistically after escape — an
        # ungated second substep would record closer approaches the
        # single-step loop never sees (caught by trace_target_exact parity)
        x, v, xt, vt, d2, inside, esc = substep(
            W, a3, None, x, v, xt, vt, d2, inside, esc,
            (step + 1 < max_steps) & ~jnp.all(esc))
        return (step + 2, x, v, xt, vt, d2, inside, esc)

    _, x, v, xt, vt, d2, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, d20, inside0, esc0))
    return xt, vt, d2


def trace_sdf(field: G.GridField, sdf: G.GridField, x0, v0, ds,
              max_steps: int):
    wf = WD.build_window_table(field)
    cf_sdf = CT.build_cell_table(sdf)  # sdf only ever evals at its own cell:
    # an 8-wide row gather costs the same as 125-wide (per-row bound) at a
    # fraction of the table memory, so the classic cell table is the right
    # fetch here.
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def substep(W, a3, ci3, x, v, xt, vt, inside, esc, valid):
        if ci3 is None:
            ci3, w0 = WD.cell_index3(wf, x)
        else:
            _, w0 = WD.cell_index3(wf, x)
        off3 = ci3 - a3
        n, nx = WD.eval_nx(W, off3, w0, field.h, mask=inside)
        v2 = v + (ds * n)[:, None] * nx
        x2 = x + ds * v2

        # sdf evaluated at the *new* position (fast.py semantics: mask is the
        # pre-substep inside)
        vals_s, w0_s, _ = CT.fetch(cf_sdf, x2, inside)
        dist, _ = CT.eval_grad_from(vals_s, w0_s, field.h)

        cur_inside = dist < 0
        cross = inside & ~cur_inside
        esc2 = esc | cross | G.escaped(field, x2, v2)
        xt2 = _where3(cross, x2, xt)
        vt2 = _where3(cross, v2, vt)
        if valid is not None:
            x2 = jnp.where(valid, x2, x)
            v2 = jnp.where(valid, v2, v)
            xt2 = jnp.where(valid, xt2, xt)
            vt2 = jnp.where(valid, vt2, vt)
            cur_inside = jnp.where(valid, cur_inside, inside)
            esc2 = jnp.where(valid, esc2, esc)
        return x2, v2, xt2, vt2, cur_inside, esc2

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        W, a3, ci3, _ = WD.fetch_window(wf, x)
        x, v, xt, vt, inside, esc = substep(
            W, a3, ci3, x, v, xt, vt, inside, esc, None)
        x, v, xt, vt, inside, esc = substep(
            W, a3, None, x, v, xt, vt, inside, esc,
            step + 1 < max_steps)
        return (step + 2, x, v, xt, vt, inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))
    return xt, vt


def backtrace(field: G.GridField, xt, vt, dx, dv, ds, max_steps: int,
              axis_name=None):
    """Constant-memory adjoint: ONE window gather + ONE (N, 125) window-row
    scatter per pair of substeps.

    Both substeps' splats land on the pair's snapped 5^3 window nodes (eval
    offsets stay in [0, 3] under the ds*n <= h precondition), so their
    contributions accumulate in-register into a single row — the scatter
    serializer is per-row bound, so this halves scatter time vs per-substep
    rows, into a destination table 4x smaller than per-cell windows
    (fields/windows.py, pallas/README.md).
    """
    wf = WD.build_window_table(field)
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    g0 = WD.zero_window_grad(wf, xt.dtype)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def substep(W, a3, ci3, x, v, la, mu, active, valid):
        x2 = x - ds * v
        xe = G.snap_to_nodes(x2, field.h)
        emask = active & G.inbounds(field, xe)
        if ci3 is None:
            ci3, w0 = WD.cell_index3(wf, xe)
        else:
            _, w0 = WD.cell_index3(wf, xe)
        off3 = ci3 - a3
        n, nx, hess, ctx = WD.eval_bwd(W, off3, w0, field.h, mask=emask)
        v2 = v - (ds * n)[:, None] * nx

        active2 = active & ~G.escaped(field, xe, -v2)

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        cw = WD.contrib(ctx, dn * ds, dnx * ds, field.h,
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

    def cond(s):
        step, *_, active, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, g = s
        # anchor the pair's window at the first reverse eval position
        xa = G.snap_to_nodes(x - ds * v, field.h)
        ci3, _ = WD.cell_index3(wf, xa)
        a3, row = WD.anchor_row(wf, ci3)
        W = wf.table.at[row].get(mode="promise_in_bounds")
        x, v, la, mu, active, cw1 = substep(
            W, a3, ci3, x, v, la, mu, active, None)
        x, v, la, mu, active, cw2 = substep(
            W, a3, None, x, v, la, mu, active, step + 1 < max_steps)
        g = WD.scatter_window(g, row, cw1 + cw2)
        return (step + 2, x, v, la, mu, active, g)

    _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, g0))
    return WD.fold_window_grad(g, wf).reshape(-1)


def backtrace_sdf(field: G.GridField, sdf: G.GridField, xt, vt, dx, dv, ds,
                  max_steps: int, axis_name=None):
    wf = WD.build_window_table(field)
    cf_sdf = CT.build_cell_table(sdf)  # see trace_sdf: cell rows suffice
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    vals_t, w0_t, _ = CT.fetch(cf_sdf, xt, active0)
    dist0, _ = CT.eval_grad_from(vals_t, w0_t, field.h)
    outside0 = dist0 >= 0
    g0 = WD.zero_window_grad(wf, xt.dtype)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def substep(W, a3, ci3, x, v, la, mu, active, outside, valid):
        x2 = x - ds * v
        xe = G.snap_to_nodes(x2, field.h)
        emask = active & G.inbounds(field, xe)
        if ci3 is None:
            ci3, w0 = WD.cell_index3(wf, xe)
        else:
            _, w0 = WD.cell_index3(wf, xe)
        off3 = ci3 - a3
        n, nx, hess, ctx = WD.eval_bwd(W, off3, w0, field.h, mask=emask)
        v2 = v - (ds * n)[:, None] * nx

        vals_s, w0_s, _ = CT.fetch(cf_sdf, xe, active)
        dist, _ = CT.eval_grad_from(vals_s, w0_s, field.h)

        active2 = active & ~G.escaped(field, xe, -v2)
        cross = ~outside & (dist >= 0)
        active2 = active2 & ~cross
        outside2 = dist >= 0

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        cw = WD.contrib(ctx, dn * ds, dnx * ds, field.h,
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
            outside2 = jnp.where(valid, outside2, outside)
        return x2, v2, la2, mu2, active2, outside2, cw

    def cond(s):
        step, *_, active, _o, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, outside, g = s
        xa = G.snap_to_nodes(x - ds * v, field.h)
        ci3, _ = WD.cell_index3(wf, xa)
        a3, row = WD.anchor_row(wf, ci3)
        W = wf.table.at[row].get(mode="promise_in_bounds")
        x, v, la, mu, active, outside, cw1 = substep(
            W, a3, ci3, x, v, la, mu, active, outside, None)
        x, v, la, mu, active, outside, cw2 = substep(
            W, a3, None, x, v, la, mu, active, outside,
            step + 1 < max_steps)
        g = WD.scatter_window(g, row, cw1 + cw2)
        return (step + 2, x, v, la, mu, active, outside, g)

    _, _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, outside0, g0))
    return WD.fold_window_grad(g, wf).reshape(-1)

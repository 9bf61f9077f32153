"""Fast-path eikonal steppers on the cell-table formulation (fields/cells.py).

Numerically identical to tracer/eikonal.py (same step math, same masks, same
exit capture — asserted by tests/test_cells.py) but each step performs ONE
contiguous 8-value row gather per ray instead of 8 scattered voxel gathers,
and the adjoint performs ONE row scatter-add into a cell-gradient table that
is un-replicated densely after the sweep.  This is the production path wired
into tracer/api.py; eikonal.py remains the readable reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..fields import cells as CT
from ..fields import grid as G


def _where3(m, a, b):
    return jnp.where(m[:, None], a, b)


def _eval(cf, x, mask, h):
    vals, w0, ci = CT.fetch(cf, x, mask)
    n, nx = CT.eval_grad_from(vals, w0, h)
    return n, nx, vals, w0, ci


def trace(field: G.GridField, x0, v0, ds, max_steps: int):
    cf = CT.build_cell_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx, _, _, _ = _eval(cf, x, inside, field.h)
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
    xt = _where3(esc, xt, x)
    return xt, vt


def trace_plane(field: G.GridField, x0, v0, pln_o, pln_d, ds, max_steps: int):
    cf = CT.build_cell_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx, _, _, _ = _eval(cf, x, inside, field.h)
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
    cf = CT.build_cell_table(field)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)
    d20 = jnp.sum((x0 - target) ** 2, axis=-1)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, d2, inside, esc = s
        n, nx, _, _, _ = _eval(cf, x, inside, field.h)
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
    return xt, vt, d2


def trace_sdf(field: G.GridField, sdf: G.GridField, x0, v0, ds, max_steps: int):
    cf = CT.build_cell_table(field)
    cf_sdf = CT.build_cell_table(sdf)
    inside0 = G.inbounds(field, x0)
    esc0 = jnp.zeros_like(inside0)
    ds = jnp.asarray(ds, dtype=x0.dtype)

    def cond(s):
        step, *_, esc = s
        return (step < max_steps) & ~jnp.all(esc)

    def body(s):
        step, x, v, xt, vt, inside, esc = s
        n, nx, _, _, _ = _eval(cf, x, inside, field.h)
        v = v + (ds * n)[:, None] * nx
        x = x + ds * v

        dist, _, _, _, _ = _eval(cf_sdf, x, inside, field.h)
        cur_inside = dist < 0
        cross = inside & ~cur_inside
        esc = esc | cross | G.escaped(field, x, v)

        xt = _where3(cross, x, xt)
        vt = _where3(cross, v, vt)
        return (step + 1, x, v, xt, vt, cur_inside, esc)

    _, x, v, xt, vt, _, esc = lax.while_loop(
        cond, body, (0, x0, v0, x0, v0, inside0, esc0))
    return xt, vt


def backtrace(field: G.GridField, xt, vt, dx, dv, ds, max_steps: int,
              axis_name=None):
    """Constant-memory adjoint with row scatter + dense fold."""
    cf = CT.build_cell_table(field)
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    g0 = CT.zero_cell_grad(cf)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def cond(s):
        step, *_, active, _ = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, g = s
        x = x - ds * v
        # snap eps-drifted positions back onto exact cell boundaries so the
        # reverse sweep reproduces the forward's masks and cell assignment
        # (see fields.grid.snap_to_nodes)
        xe = G.snap_to_nodes(x, field.h)
        emask = active & G.inbounds(field, xe)
        vals, w0, ci = CT.fetch(cf, xe, emask)
        n, nx = CT.eval_grad_from(vals, w0, field.h)
        hess = CT.eval_hess_from(vals, w0, field.h)
        v = v - (ds * n)[:, None] * nx

        active = active & ~G.escaped(field, xe, -v)

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        contrib = CT.splat_rows(w0, dn * ds, dnx * ds, field.h,
                                mask=active & emask)
        g = CT.scatter_rows(g, ci, contrib)

        la = la + ds * (dn[:, None] * nx + n[:, None] * G.hess_matvec(hess, mu))
        mu = mu + ds * la
        return (step + 1, x, v, la, mu, active, g)

    _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, g0))
    return CT.fold_cell_grad(g, cf).reshape(-1)


def backtrace_sdf(field: G.GridField, sdf: G.GridField, xt, vt, dx, dv, ds,
                  max_steps: int, axis_name=None):
    cf = CT.build_cell_table(field)
    cf_sdf = CT.build_cell_table(sdf)
    ds = jnp.asarray(ds, dtype=xt.dtype)
    la0 = dx
    mu0 = dv + ds * dx
    active0 = ~G.escaped(field, xt, -vt)
    dist0, _, _, _, _ = _eval(cf_sdf, xt, active0, field.h)
    outside0 = dist0 >= 0
    g0 = CT.zero_cell_grad(cf)
    if axis_name is not None:
        g0 = lax.pcast(g0, axis_name, to="varying")

    def cond(s):
        step, *_, active, _o, _g = s
        return (step < max_steps) & jnp.any(active)

    def body(s):
        step, x, v, la, mu, active, outside, g = s
        x = x - ds * v
        xe = G.snap_to_nodes(x, field.h)
        emask = active & G.inbounds(field, xe)
        vals, w0, ci = CT.fetch(cf, xe, emask)
        n, nx = CT.eval_grad_from(vals, w0, field.h)
        hess = CT.eval_hess_from(vals, w0, field.h)
        v = v - (ds * n)[:, None] * nx

        dist, _, _, _, _ = _eval(cf_sdf, xe, active, field.h)
        active = active & ~G.escaped(field, xe, -v)
        cross = ~outside & (dist >= 0)
        active = active & ~cross
        outside = dist >= 0

        dn = jnp.einsum("nd,nd->n", mu, nx)
        dnx = n[:, None] * mu
        contrib = CT.splat_rows(w0, dn * ds, dnx * ds, field.h,
                                mask=active & emask)
        g = CT.scatter_rows(g, ci, contrib)

        la = la + ds * (dn[:, None] * nx + n[:, None] * G.hess_matvec(hess, mu))
        mu = mu + ds * la
        return (step + 1, x, v, la, mu, active, outside, g)

    _, _, _, _, _, _, _, g = lax.while_loop(
        cond, body, (0, xt, vt, la0, mu0, active0, outside0, g0))
    return CT.fold_cell_grad(g, cf).reshape(-1)

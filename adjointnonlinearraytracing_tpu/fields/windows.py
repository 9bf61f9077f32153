"""Snapped-window formulation of the trilinear field — the paired-step TPU path.

Measured on v5e (pallas/README.md): XLA gathers and scatters in the stepper
loops are *per-row latency bound* — row width is free up to 128 lanes, and
scatter cost grows with the DESTINATION table's size (8 MB: ~8 ns/row,
68 MB: ~16 ns, 550 MB: ~76 ns random-index).  Three design rules fall out:

1. **One windowed gather per TWO substeps.**  A 5^3-node window (125 lanes,
   within the free-width cliff) anchored on the even cell lattice covers
   the 4 cells ``a..a+3``; both substeps of a pair evaluate inside it
   because per-step per-axis movement is ``ds * n <= h`` (tracer/api.py
   gates on ``ds <= h/2``).
2. **One scatter per pair, not per substep.**  Both substeps' adjoint
   splats land on the same window's 125 nodes, so they accumulate
   in-register and issue ONE (N, 125) row scatter — half the scatter rows
   of a per-substep scheme at identical per-row cost.
3. **Snap anchors to the even lattice.**  Anchors ``a = 2*floor((c1-1)/2)``
   give a site table of only ``(res/2+2)^3`` rows (275k at 128^3, 137 MB)
   — scatters into it cost ~4.9 ms per 262k random rows vs ~20 ms into a
   per-cell window table (2.1M rows, 550 MB).

Coverage proof (per axis): ``c1 - 1 in {a, a+1}`` by the floor, so
``c1 in {a+1, a+2}`` and the pair's second cell ``c2 in c1 +- 1`` lies in
``[a, a+3]`` — all inside the window's 4 cells, for ANY movement direction.
Eval offsets relative to the anchor are therefore in [0, 3].

All math is kept in (N, 125) lane layouts — never (N, 5, 5, 5), which
wastes the (8, 128) hardware tiles — so XLA fuses the weight-pattern
products and row-sums into a single pass over the gathered rows.

Semantics are identical to fields/cells.py (same clamped extended-cell
indexing, same interpolation math, different summation order only);
asserted against the classic path by tests/test_paired.py.

Reference parity: the node values and clamping reproduce
/root/reference/src/volume.cpp:101-181 exactly, as fields/grid.py does.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid import GridField

_W = 5                 # nodes per axis in a window
_LANES = _W ** 3       # 125 live lanes
_ROW = 128             # physical row width: padded to the (8, 128) tile so
#                        row gathers/scatters stay on the fast vectorized
#                        lowering (a 125-wide row scalarizes, ~1000x slower)


class WindowField(NamedTuple):
    """Snapped-window view: table (sz*sy*sx, 128; 125 live lanes).

    Site ``s`` (per-axis) holds the 5^3 nodes of the even-lattice anchor
    ``a = 2*s - 2``: lane m = (mz*5 + my)*5 + mx stores
    ``data[clip(a - 1 + m_axis, 0, res-1)]`` per axis.  Lanes 125..127 are
    dead padding (zero weights in every pattern).
    """

    table: jax.Array   # (sz*sy*sx, 128)
    h: jax.Array | float
    res: tuple         # (res_x, res_y, res_z) voxel resolution
    sites: tuple       # (sx, sy, sz) anchor-site counts


def n_sites(res_axis: int) -> int:
    """Anchor sites along one axis: a in {-2, 0, ..., 2*floor((res-1)/2)}."""
    return (res_axis - 1) // 2 + 2


def window_bytes(shape, itemsize: int) -> int:
    """HBM footprint of the snapped window table for a (D, H, W) field."""
    d, hgt, wid = shape
    return n_sites(d) * n_sites(hgt) * n_sites(wid) * _ROW * itemsize


def build_window_table(field: GridField) -> WindowField:
    """Dense construction from the 3-wide edge-padded volume.

    P3[i] = data[clip(i-3)]; site s, axis-lane m reads node ``2s - 3 + m``
    = P3[2s + m], i.e. a stride-2 slice at offset m.
    """
    data = field.data  # (D, H, W)
    d, hgt, wid = data.shape
    sx, sy, sz = n_sites(wid), n_sites(hgt), n_sites(d)
    P3 = jnp.pad(data, 3, mode="edge")

    rows = []
    for mz in range(_W):
        for my in range(_W):
            for mx in range(_W):
                rows.append(jax.lax.slice(
                    P3, (mz, my, mx),
                    (mz + 2 * (sz - 1) + 1, my + 2 * (sy - 1) + 1,
                     mx + 2 * (sx - 1) + 1),
                    (2, 2, 2)))
    table = jnp.stack(rows, axis=-1)  # (sz, sy, sx, 125)
    table = table.reshape(-1, _LANES)
    table = jnp.pad(table, ((0, 0), (0, _ROW - _LANES)))  # dead lanes
    return WindowField(table, field.h, (wid, hgt, d), (sx, sy, sz))


def cell_index3(wf: WindowField, p: jax.Array):
    """Per-axis clamped extended-cell index (N, 3) int32 + fractional w0.

    Identical indexing to cells.cell_index (which returns it flattened).
    """
    wid, hgt, d = wf.res
    pm = p / wf.h
    pos = jnp.floor(pm)
    w0 = (pm - pos).astype(p.dtype)
    res_arr = jnp.array([wid, hgt, d])
    ci3 = jnp.clip(pos.astype(jnp.int32), -1, res_arr - 1) + 1  # in [0, res]
    return ci3, w0


def anchor_row(wf: WindowField, ci3: jax.Array):
    """Even-lattice anchor of the pair whose first eval cell is ``ci3``.

    Returns (a3 (N,3) int32 anchors, row (N,) flat site index).
    """
    a3 = 2 * ((ci3 - 1) // 2)          # even, in [-2, 2*floor((res-1)/2)]
    s3 = (a3 + 2) >> 1                 # site index, in [0, n_sites-1]
    sx, sy, _ = wf.sites
    row = (s3[:, 2] * sy + s3[:, 1]) * sx + s3[:, 0]
    return a3, row


def fetch_window(wf: WindowField, p: jax.Array):
    """One (N, 125) row gather anchored at p's snapped site: (W, a3, ci3, w0)."""
    ci3, w0 = cell_index3(wf, p)
    a3, row = anchor_row(wf, ci3)
    W = wf.table.at[row].get(mode="promise_in_bounds")
    return W, a3, ci3, w0


def _lane_axes(dtype=jnp.int32):
    """Per-lane (mx, my, mz) window-node coordinates; dead pad lanes get a
    sentinel that never matches any offset, zeroing their weights."""
    lane = jnp.arange(_ROW, dtype=dtype)
    mx = lane % _W
    my = (lane // _W) % _W
    mz = lane // (_W * _W)
    dead = lane >= _LANES
    sent = jnp.int32(-(10 ** 6))
    return (jnp.where(dead, sent, mx), jnp.where(dead, sent, my),
            jnp.where(dead, sent, mz))


def _axis_weights(m_lane, off, w0):
    """(N, 125) interpolation weights along one axis: (1-w0) at lane==off,
    w0 at lane==off+1, zero elsewhere.  ``off`` is (N,) int32."""
    o = off[:, None]
    w = jnp.where(m_lane[None, :] == o, 1.0 - w0[:, None], 0.0)
    return w + jnp.where(m_lane[None, :] == o + 1, w0[:, None], 0.0)


def _axis_dweights(m_lane, off, like):
    """(N, 125) difference pattern along one axis: -1 at off, +1 at off+1."""
    o = off[:, None]
    pos = (m_lane[None, :] == o + 1)
    neg = (m_lane[None, :] == o)
    return pos.astype(like.dtype) - neg.astype(like.dtype)


def eval_window(W, off3, w0, h, mask=None, want_hess=False,
                want_patterns=False):
    """Trilinear value/gradient (and off-diagonal Hessian) from a window row.

    ``off3``: (N, 3) int32 per-axis window offsets of the evaluation cell,
    normally in [0, 3].  Offsets outside [0, 3] mean the ``ds * n <= h``
    movement precondition was violated (the window no longer covers the
    eval cell); for masked-active rays the value is poisoned to NaN so the
    failure is loud instead of silently wrong (disable with
    ANRT_CHECK_WINDOW=0).  Same math as cells.eval_grad_from /
    eval_hess_from (volume.cpp:101-181, :40-99), different summation order.

    ``want_patterns`` additionally returns the (N, 125) per-axis weight /
    difference patterns ``(wx, wy, wz, dwx, dwy, dwz)`` — the adjoint splat
    (window_contrib) is exactly their transpose combination, so the backward
    sweep reuses them instead of recomputing per-corner stacks.
    """
    mx, my, mz = _lane_axes()
    viol = None
    if os.environ.get("ANRT_CHECK_WINDOW", "1") != "0":
        viol = jnp.any((off3 < 0) | (off3 > _W - 2), axis=-1)
        if mask is not None:
            viol = viol & mask
    off3 = jnp.clip(off3, 0, _W - 2)
    ox, oy, oz = off3[:, 0], off3[:, 1], off3[:, 2]

    if mask is not None:
        W = jnp.where(mask[:, None], W, 0.0)

    wx = _axis_weights(mx, ox, w0[:, 0])
    wy = _axis_weights(my, oy, w0[:, 1])
    wz = _axis_weights(mz, oz, w0[:, 2])
    dwx = _axis_dweights(mx, ox, W)
    dwy = _axis_dweights(my, oy, W)
    dwz = _axis_dweights(mz, oz, W)

    inv_h = 1.0 / h
    yz = wy * wz
    n = jnp.sum(W * (wx * yz), axis=-1)
    if viol is not None:
        n = jnp.where(viol, jnp.nan, n)
    gx = jnp.sum(W * (dwx * yz), axis=-1) * inv_h
    gy = jnp.sum(W * (wx * dwy * wz), axis=-1) * inv_h
    gz = jnp.sum(W * (wx * wy * dwz), axis=-1) * inv_h
    grad = jnp.stack([gx, gy, gz], axis=-1)
    out = (n, grad)
    if want_hess:
        inv_h2 = inv_h * inv_h
        hxy = jnp.sum(W * (dwx * dwy * wz), axis=-1) * inv_h2
        hxz = jnp.sum(W * (dwx * wy * dwz), axis=-1) * inv_h2
        hyz = jnp.sum(W * (wx * dwy * dwz), axis=-1) * inv_h2
        out = out + ((hxy, hxz, hyz),)
    if want_patterns:
        out = out + ((wx, wy, wz, dwx, dwy, dwz),)
    return out


# ---------------------------------------------------------------------------
# Factorized (separable) eval/contrib — the round-3 fast path
# ---------------------------------------------------------------------------
#
# eval_window builds six full (N, 125) lane patterns and runs 4-7 independent
# 125-lane reduces, each re-reading the materialized window rows from HBM —
# the round-2 trace attributed ~0.73 s/iter of the 128^3 bench to exactly
# these fusions.  But the trilinear stencil is SEPARABLE: contracting the
# window one axis at a time (z: 125->25 lanes, y: 25->5, x: 5->scalar, each a
# 2-tap select at the axis offset) produces value, gradient, and off-diagonal
# Hessian in ONE multi-output fusion that reads the window rows once and
# touches ~8x fewer lanes.  The adjoint contribution row is the transpose:
# scalars expand x->y->z through the same 2-tap vectors.  Summation order
# differs from eval_window (nested two-term lerps vs one 125-lane reduce), so
# results agree to f32 rounding, not bitwise; tests/test_paired.py asserts
# both paths against fields/cells.py at ATOL.
#
# ANRT_WINDOW_EVAL=patterns restores the round-2 path (read at trace time).


def eval_mode() -> str:
    return os.environ.get("ANRT_WINDOW_EVAL", "factorized")


def _axis5(off, w0, dtype):
    """(N, 5) 2-tap interp / difference vectors for one axis: (1-w0) at lane
    ``off``, w0 at ``off+1`` (and -1/+1 for the difference)."""
    j = jnp.arange(_W, dtype=jnp.int32)[None, :]
    o = off[:, None]
    wi = jnp.where(j == o, 1.0 - w0[:, None], 0.0) \
        + jnp.where(j == o + 1, w0[:, None], 0.0)
    di = (j == o + 1).astype(dtype) - (j == o).astype(dtype)
    return wi, di


def _contract_ms(A, off, w0, blk):
    """Contract the most-significant axis of an (N, 5*blk) lane block.

    Selects sub-blocks ``off`` and ``off+1`` (off in [0, 3] after clamping)
    and returns (2-tap interp (N, blk), difference (N, blk))."""
    n = A.shape[0]
    sel0 = jnp.zeros((n, blk), A.dtype)
    sel1 = jnp.zeros((n, blk), A.dtype)
    for k in range(_W - 1):
        m = (off == k)[:, None]
        sel0 = jnp.where(m, jax.lax.slice_in_dim(A, k * blk, (k + 1) * blk,
                                                 axis=1), sel0)
        sel1 = jnp.where(m, jax.lax.slice_in_dim(A, (k + 1) * blk,
                                                 (k + 2) * blk, axis=1), sel1)
    d = sel1 - sel0
    return sel0 + w0[:, None] * d, d


def eval_window_fac(W, off3, w0, h, mask=None, want_hess=False):
    """Separable twin of eval_window (same outputs, same NaN/mask semantics,
    f32-rounding-level differences only)."""
    viol = None
    if os.environ.get("ANRT_CHECK_WINDOW", "1") != "0":
        viol = jnp.any((off3 < 0) | (off3 > _W - 2), axis=-1)
        if mask is not None:
            viol = viol & mask
    off3 = jnp.clip(off3, 0, _W - 2)
    ox, oy, oz = off3[:, 0], off3[:, 1], off3[:, 2]

    Wl = W[:, :_LANES]
    Wz, Dz = _contract_ms(Wl, oz, w0[:, 2], _W * _W)   # (N, 25)
    Wzy, WzDy = _contract_ms(Wz, oy, w0[:, 1], _W)     # (N, 5)
    Dzy, DzDy = _contract_ms(Dz, oy, w0[:, 1], _W)

    nI, nD = _contract_ms(Wzy, ox, w0[:, 0], 1)
    gyI, gyD = _contract_ms(WzDy, ox, w0[:, 0], 1)
    gzI, gzD = _contract_ms(Dzy, ox, w0[:, 0], 1)

    inv_h = 1.0 / h
    n = nI[:, 0]
    gx = nD[:, 0] * inv_h
    gy = gyI[:, 0] * inv_h
    gz = gzI[:, 0] * inv_h
    grad = jnp.stack([gx, gy, gz], axis=-1)
    if mask is not None:
        n = jnp.where(mask, n, 0.0)
        grad = jnp.where(mask[:, None], grad, 0.0)
    if viol is not None:
        n = jnp.where(viol, jnp.nan, n)
    out = (n, grad)
    if want_hess:
        hyzI, _ = _contract_ms(DzDy, ox, w0[:, 0], 1)
        inv_h2 = inv_h * inv_h
        hxy = gyD[:, 0] * inv_h2
        hxz = gzD[:, 0] * inv_h2
        hyz = hyzI[:, 0] * inv_h2
        if mask is not None:
            hxy = jnp.where(mask, hxy, 0.0)
            hxz = jnp.where(mask, hxz, 0.0)
            hyz = jnp.where(mask, hyz, 0.0)
        out = out + ((hxy, hxz, hyz),)
    return out


def _expand_ms(A, w5):
    """(N, blk) x (N, 5) -> (N, 5*blk): block j scaled by lane j of w5."""
    return (w5[:, :, None] * A[:, None, :]).reshape(A.shape[0], -1)


def window_contrib_fac(off3, w0, val, grad, h, mask=None):
    """Separable twin of window_contrib, built from (off3, w0) directly
    (the six (N, 125) patterns are never materialized)."""
    off3 = jnp.clip(off3, 0, _W - 2)
    dt = val.dtype
    wx5, dx5 = _axis5(off3[:, 0], w0[:, 0].astype(dt), dt)
    wy5, dy5 = _axis5(off3[:, 1], w0[:, 1].astype(dt), dt)
    wz5, dz5 = _axis5(off3[:, 2], w0[:, 2].astype(dt), dt)
    inv_h = jnp.asarray(1.0 / h, dtype=dt)
    P = val[:, None] * wx5 + (grad[:, 0] * inv_h)[:, None] * dx5
    Q = (grad[:, 1] * inv_h)[:, None] * wx5
    R = (grad[:, 2] * inv_h)[:, None] * wx5
    U = _expand_ms(P, wy5) + _expand_ms(Q, dy5)        # (N, 25)
    V = _expand_ms(R, wy5)
    cw = _expand_ms(U, wz5) + _expand_ms(V, dz5)       # (N, 125)
    cw = jnp.pad(cw, ((0, 0), (0, _ROW - _LANES)))
    if mask is not None:
        cw = jnp.where(mask[:, None], cw, 0.0)
    return cw


def eval_nx(W, off3, w0, h, mask=None):
    """Forward-substep eval: (n, grad) via the trace-time-selected path."""
    if eval_mode() == "factorized":
        return eval_window_fac(W, off3, w0, h, mask=mask)
    return eval_window(W, off3, w0, h, mask=mask)


def eval_bwd(W, off3, w0, h, mask=None):
    """Backward-substep eval: (n, grad, hess, ctx); pass ctx to contrib()."""
    if eval_mode() == "factorized":
        n, grad, hess = eval_window_fac(W, off3, w0, h, mask=mask,
                                        want_hess=True)
        return n, grad, hess, (off3, w0)
    n, grad, hess, pat = eval_window(W, off3, w0, h, mask=mask,
                                     want_hess=True, want_patterns=True)
    return n, grad, hess, pat


def contrib(ctx, val, grad, h, mask=None):
    """Adjoint window-row contribution from eval_bwd's ctx."""
    if eval_mode() == "factorized":
        off3, w0 = ctx
        return window_contrib_fac(off3, w0, val, grad, h, mask=mask)
    return window_contrib(ctx, val, grad, h, mask=mask)


# ---------------------------------------------------------------------------
# Window-lane gradient accumulation (adjoint scatter target)
# ---------------------------------------------------------------------------
#
# Both substeps of a pair splat onto the anchor's 125 window nodes, so their
# contributions accumulate in-register into a single (N, 125) row and issue
# ONE row scatter per pair — the scatter serializer is per-row latency
# bound, so this halves scatter time vs per-substep rows.  The destination
# is the (sites^3, 125) snapped table: 4x fewer bytes than a per-cell window
# table, which matters because scatter per-row cost grows with the
# destination's size (pallas/README.md measurements).


def zero_window_grad(wf: WindowField, dtype) -> jax.Array:
    return jnp.zeros((wf.table.shape[0], _ROW), dtype=dtype)


def window_contrib(patterns, val, grad, h, mask=None):
    """(N, 125) window-node contribution rows: transpose of eval_window.

    ``val``/``grad`` are the value and gradient cotangents to deposit
    (already scaled by ds by the caller, matching volume.cpp:182-244 /
    cells.splat_rows).  ``patterns`` comes from eval_window(want_patterns).
    """
    wx, wy, wz, dwx, dwy, dwz = patterns
    inv_h = jnp.asarray(1.0 / h, dtype=val.dtype)
    cw = (val[:, None] * (wx * wy * wz)
          + (grad[:, 0] * inv_h)[:, None] * (dwx * wy * wz)
          + (grad[:, 1] * inv_h)[:, None] * (wx * dwy * wz)
          + (grad[:, 2] * inv_h)[:, None] * (wx * wy * dwz))
    if mask is not None:
        cw = jnp.where(mask[:, None], cw, 0.0)
    return cw


def scatter_window(g: jax.Array, row_idx: jax.Array, cw: jax.Array):
    """One (N, 128) row scatter-add into the window-grad table (dead pad
    lanes carry zero contributions)."""
    return g.at[row_idx].add(cw, mode="promise_in_bounds")


def fold_window_grad(g: jax.Array, wf: WindowField) -> jax.Array:
    """Collapse the window-grad table into the voxel gradient.

    Transpose of build_window_table: lane m of site s deposited onto padded
    node ``2s + m`` of the 3-wide edge-padded volume.  Writing ``m = 2q + r``
    (q in 0..2, r in 0..1), padded node ``2(s+q) + r`` maps to element
    [s+q, r] of an (S+2, 2)-per-axis strided view — so each lane folds in as
    a contiguous slice-add (dynamic-update-slice, no scatter).  The 3-wide
    edge pad then collapses into the boundary voxels (transpose of
    P3[i] = data[clip(i-3, 0, res-1)]).
    """
    wid, hgt, d = wf.res
    sx, sy, sz = wf.sites
    t = g.reshape(sz, sy, sx, _ROW)  # lanes >= 125 are dead (all-zero)
    gp = jnp.zeros((sz + 2, 2, sy + 2, 2, sx + 2, 2), dtype=g.dtype)
    k = 0
    for mz in range(_W):
        qz, rz = divmod(mz, 2)
        for my in range(_W):
            qy, ry = divmod(my, 2)
            for mx in range(_W):
                qx, rx = divmod(mx, 2)
                gp = gp.at[qz:qz + sz, rz, qy:qy + sy, ry,
                           qx:qx + sx, rx].add(t[..., k])
                k += 1
    # linearize each axis: padded node index l = 2u + r
    gp = gp.reshape(2 * (sz + 2), 2 * (sy + 2), 2 * (sx + 2))
    # keep the real padded extent (res + 6 nodes), drop the alignment tail
    gp = gp[: d + 6, : hgt + 6, : wid + 6]

    def collapse3(axis, arr):
        """Transpose of the 3-wide edge pad: padded node l holds
        data[clip(l-3, 0, res-1)], so core l in [3, res+2] maps 1:1 onto
        the voxels and the 3 clipped layers each side add into the
        boundary voxels."""
        n = arr.shape[axis]
        lo = jax.lax.slice_in_dim(arr, 0, 3, axis=axis)
        hi = jax.lax.slice_in_dim(arr, n - 3, n, axis=axis)
        core = jax.lax.slice_in_dim(arr, 3, n - 3, axis=axis)
        idx0 = [slice(None)] * core.ndim
        idx0[axis] = 0
        idxl = [slice(None)] * core.ndim
        idxl[axis] = core.shape[axis] - 1
        core = core.at[tuple(idx0)].add(jnp.sum(lo, axis=axis))
        core = core.at[tuple(idxl)].add(jnp.sum(hi, axis=axis))
        return core

    out = gp
    for ax in range(3):
        out = collapse3(ax, out)
    return out  # (d, hgt, wid)

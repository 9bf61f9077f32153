"""Node-window formulation of the trilinear field — the paired-step TPU path.

Measured on v5e (pallas/README.md): XLA gathers and scatters in the stepper
loops are *per-row latency bound* — a 64-wide row costs the same as an 8-wide
row (gather ~3.5 ms, scatter ~3.8 ms per 262k rows), while an 8-wide scatter
row costs 11.2 ms.  Two redesigns fall out:

1. **Windowed gather, one per TWO steps.**  For each extended cell ``c`` we
   precompute the 4^3 surrounding *nodes* ``W[c][m] = data[clip(c-2+m)]``
   (m in 0..3 per axis, 64 floats).  One (N, 64) row gather anchored at the
   pair's first cell serves both substeps: the first evaluates at window
   offset 1 (its own cell), and after one step of at most ``ds * n_max <= h``
   per axis the new cell is within c±1, whose stencil nodes ``clip(c'-1..c')``
   all lie inside the window.  Gather count halves at unchanged per-gather
   cost.

2. **Supercell scatter, 128-wide rows.**  The adjoint's per-step (N, 8)
   row scatter becomes an (N, 128) scatter into a table of disjoint
   4x2x2-cell supercells (16 cells x 8 corners), with the cell's slot
   selected by lane arithmetic.  Measured 3.4 ms per 262k updates vs 11.2 ms
   for 8-wide rows — 3.3x faster per update at identical update count.

Validity precondition for the windowed gather: per-step per-axis movement
``ds * max|v| <= h``.  Since ``|v| = n`` and every reference experiment keeps
``n <= sqrt(2) < 2`` (Luneburg/fiber peak index), the tracer API enables this
path when ``ds <= h/2`` and falls back to the classic cell-table path
otherwise (tracer/api.py); override with ANRT_FAST_PATH=paired|classic.

All math is kept in (N, 64)/(N, 8) lane layouts — never (N, 4, 4, 4), which
wastes the (8, 128) hardware tiles — so XLA fuses the weight-pattern products
and row-sums into a single pass over the gathered rows.

Semantics are identical to fields/cells.py (same clamped extended-cell
indexing, same interpolation math, different summation order only); asserted
against the classic path by tests/test_paired.py.

Reference parity: the node values and clamping reproduce
/root/reference/src/volume.cpp:101-181 exactly, as fields/grid.py does.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid import GridField
from . import cells as CT


class WindowField(NamedTuple):
    """Node-window view: table ((res_z+1)*(res_y+1)*(res_x+1), 64).

    Row ``c`` (flat extended-cell index, same convention as
    cells.CellField) holds the 4^3 nodes ``data[clip(c-2+m, 0, res-1)]``
    for m in 0..3 per axis; lane = (mz*4 + my)*4 + mx.
    """

    table: jax.Array  # (ext_z*ext_y*ext_x, 64)
    h: jax.Array | float
    res: tuple  # (res_x, res_y, res_z) voxel resolution


def window_bytes(shape, itemsize: int) -> int:
    """HBM footprint of the window table for a (D, H, W) field."""
    d, hgt, wid = shape
    return (d + 1) * (hgt + 1) * (wid + 1) * 64 * itemsize


def build_window_table(field: GridField) -> WindowField:
    """Dense construction from the twice-edge-padded volume."""
    data = field.data  # (D, H, W)
    d, hgt, wid = data.shape
    P2 = jnp.pad(data, 2, mode="edge")  # P2[i] = data[clip(i-2)]

    rows = []
    for mz in range(4):
        for my in range(4):
            for mx in range(4):
                rows.append(jax.lax.slice(
                    P2, (mz, my, mx),
                    (mz + d + 1, my + hgt + 1, mx + wid + 1)))
    table = jnp.stack(rows, axis=-1)  # (D+1, H+1, W+1, 64)
    return WindowField(table.reshape(-1, 64), field.h, (wid, hgt, d))


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


def flatten_ci3(wf: WindowField, ci3: jax.Array):
    wid, hgt, _ = wf.res
    return (ci3[:, 2] * (hgt + 1) + ci3[:, 1]) * (wid + 1) + ci3[:, 0]


def fetch_window(wf: WindowField, p: jax.Array):
    """One (N, 64) row gather anchored at p's cell: (W, w0, ci3)."""
    ci3, w0 = cell_index3(wf, p)
    W = wf.table.at[flatten_ci3(wf, ci3)].get(mode="promise_in_bounds")
    return W, ci3, w0


def _lane_axes(dtype=jnp.int32):
    lane = jnp.arange(64, dtype=dtype)
    return lane % 4, (lane // 4) % 4, lane // 16  # mx, my, mz


def _axis_weights(m_lane, off, w0):
    """(N, 64) interpolation weights along one axis: (1-w0) at lane==off,
    w0 at lane==off+1, zero elsewhere.  ``off`` is (N,) int32 (or a python
    int for the static first substep)."""
    if isinstance(off, int):
        o = jnp.int32(off)
        w = jnp.where(m_lane[None, :] == o, 1.0 - w0[:, None], 0.0)
        return w + jnp.where(m_lane[None, :] == o + 1, w0[:, None], 0.0)
    o = off[:, None]
    w = jnp.where(m_lane[None, :] == o, 1.0 - w0[:, None], 0.0)
    return w + jnp.where(m_lane[None, :] == o + 1, w0[:, None], 0.0)


def _axis_dweights(m_lane, off, like):
    """(N, 64) difference pattern along one axis: -1 at off, +1 at off+1."""
    if isinstance(off, int):
        o = jnp.int32(off)
        pos = (m_lane[None, :] == o + 1)
        neg = (m_lane[None, :] == o)
        return pos.astype(like.dtype) - neg.astype(like.dtype)
    o = off[:, None]
    pos = (m_lane[None, :] == o + 1)
    neg = (m_lane[None, :] == o)
    return pos.astype(like.dtype) - neg.astype(like.dtype)


def eval_window(W, off3, w0, h, mask=None, want_hess=False):
    """Trilinear value/gradient (and off-diagonal Hessian) from a window row.

    ``off3``: per-axis window offsets of the evaluation cell — either the
    python int 1 (the anchor cell itself, first substep) or an (N, 3) int32
    array (second substep), normally in [0, 2].  Offsets outside [0, 2] mean
    the ``ds * n <= h`` movement precondition was violated (the window no
    longer covers the eval cell); for masked-active rays the value is
    poisoned to NaN so the failure is loud instead of silently wrong
    (disable with ANRT_CHECK_WINDOW=0).  Same math as cells.eval_grad_from /
    eval_hess_from (volume.cpp:101-181, :40-99), different summation order.
    """
    mx, my, mz = _lane_axes()
    viol = None
    if isinstance(off3, int):
        ox = oy = oz = off3
    else:
        if os.environ.get("ANRT_CHECK_WINDOW", "1") != "0":
            viol = jnp.any((off3 < 0) | (off3 > 2), axis=-1)
            if mask is not None:
                viol = viol & mask
        off3 = jnp.clip(off3, 0, 2)
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
    if not want_hess:
        return n, grad

    inv_h2 = inv_h * inv_h
    hxy = jnp.sum(W * (dwx * dwy * wz), axis=-1) * inv_h2
    hxz = jnp.sum(W * (dwx * wy * dwz), axis=-1) * inv_h2
    hyz = jnp.sum(W * (wx * dwy * dwz), axis=-1) * inv_h2
    return n, grad, (hxy, hxz, hyz)


def window_offsets(ci3_anchor: jax.Array, ci3_eval: jax.Array):
    """Per-axis offsets of the eval cell within the anchor's window.

    In-range [0, 2] is guaranteed by the ``ds * n_max <= h`` precondition.
    Returned unclipped: eval_window clips defensively and (by default)
    NaN-poisons active rays whose offset left the window, so a precondition
    violation surfaces loudly instead of producing silently wrong results.
    """
    return ci3_eval - ci3_anchor + 1


# ---------------------------------------------------------------------------
# Supercell gradient accumulation (adjoint scatter target)
# ---------------------------------------------------------------------------


# Supercell shape (cells per axis): 4 along x, 2 along y/z -> 16 cells x 8
# corners = 128-lane rows.  Measured v5e scatter: 128-wide rows cost 3.4 ms
# per 262k updates vs 3.8 ms at 64 and 11.2 ms at 8 (pallas/README.md).
_SX, _SY, _SZ = 4, 2, 2
_SLOTS = _SX * _SY * _SZ


def super_dims(wf_res):
    wid, hgt, d = wf_res
    ext_x, ext_y, ext_z = wid + 1, hgt + 1, d + 1
    return ((ext_x + _SX - 1) // _SX, (ext_y + _SY - 1) // _SY,
            (ext_z + _SZ - 1) // _SZ)


def zero_super_grad(wf: WindowField, dtype) -> jax.Array:
    sxc, syc, szc = super_dims(wf.res)
    return jnp.zeros((szc * syc * sxc, _SLOTS * 8), dtype=dtype)


def scatter_super(wf: WindowField, g: jax.Array, ci3: jax.Array,
                  contrib8: jax.Array) -> jax.Array:
    """One (N, 128) row scatter-add: cell ci3's 8-corner contribution lands
    in its 4x2x2 supercell at lane block slot*8..slot*8+8."""
    sxc, syc, _ = super_dims(wf.res)
    scx = ci3[:, 0] // _SX
    scy = ci3[:, 1] // _SY
    scz = ci3[:, 2] // _SZ
    slot = ((ci3[:, 2] % _SZ) * _SY + (ci3[:, 1] % _SY)) * _SX \
        + (ci3[:, 0] % _SX)
    row_idx = (scz * syc + scy) * sxc + scx

    lane_slot = jnp.arange(_SLOTS * 8, dtype=jnp.int32) // 8
    row = jnp.where(lane_slot[None, :] == slot[:, None],
                    jnp.tile(contrib8, (1, _SLOTS)), 0.0)
    return g.at[row_idx].add(row, mode="promise_in_bounds")


def fold_super_grad(g: jax.Array, wf: WindowField) -> jax.Array:
    """Un-interleave the supercell table into the voxel gradient.

    Supercell slots expand back to the extended cell table (cells.CellField
    layout), which cells.fold_cell_grad collapses to the voxel grid.
    """
    wid, hgt, d = wf.res
    sxc, syc, szc = super_dims(wf.res)
    # (szc, syc, sxc, slot_z, slot_y, slot_x, corner)
    cg = g.reshape(szc, syc, sxc, _SZ, _SY, _SX, 8)
    cg = jnp.transpose(cg, (0, 3, 1, 4, 2, 5, 6))
    cg = cg.reshape(_SZ * szc, _SY * syc, _SX * sxc, 8)
    cg = cg[: d + 1, : hgt + 1, : wid + 1]  # drop the unused parity pad

    cf = CT.CellField(cg, wf.h, wf.res)  # table only used for shape/res
    return CT.fold_cell_grad(cg.reshape(-1, 8), cf)

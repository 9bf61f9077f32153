"""Cell-table formulation of the trilinear field — the TPU fast path.

XLA TPU gathers cost roughly per-index, not per-byte; the naive stepper
gathers 8 scattered voxels per ray per step (volume.cpp:143-150).  But the
8-corner stencil of trilinear interpolation is exactly *one grid cell*, so we
precompute a cell table ``T[cz, cy, cx, 8]`` holding every cell's corner
values (with the reference's border clamping baked in) using dense shifted
slices — then each ray step is ONE contiguous 8-value row gather (32 B)
instead of 8 scattered ones, and the adjoint's 16 scatter-adds collapse to
ONE row scatter-add into a cell-gradient table plus a dense un-replication
fold at the end of the sweep.

Extended indexing: with ``pm = p / h`` and ``pos = floor(pm)`` the cell index
per axis is ``ci = clip(pos, -1, res-1) + 1`` in [0, res]; cell ``ci`` has
corner voxels ``clip(ci-1, 0, res-1)`` and ``clip(ci, 0, res-1)``, which
reproduces volume.cpp:131-132's per-corner clamping exactly for *every*
out-of-range position (verified against fields.grid in tests/test_cells.py).

Corner ordering is (a=x, b=y, c=z) minor-to-major: corner = a + 2*b + 4*c.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .grid import GridField


class CellField(NamedTuple):
    """Cell-table view of a GridField: table (res_z+1, res_y+1, res_x+1, 8)."""

    table: jax.Array
    h: jax.Array | float
    res: tuple  # (res_x, res_y, res_z) voxel resolution

    @property
    def flat(self):
        c = self.table
        return c.reshape(-1, 8)


def build_cell_table(field: GridField) -> CellField:
    """Dense construction: pad-edge, then stack the 8 shifted corner slices."""
    data = field.data  # (D, H, W)
    d, hgt, wid = data.shape
    P = jnp.pad(data, 1, mode="edge")  # (D+2, H+2, W+2); P[i] = data[clip(i-1)]

    corners = []
    for c in range(2):          # z corner
        for b in range(2):      # y corner
            for a in range(2):  # x corner
                corners.append(
                    jax.lax.slice(P, (c, b, a), (c + d + 1, b + hgt + 1, a + wid + 1)))
    table = jnp.stack(corners, axis=-1)  # (D+1, H+1, W+1, 8)
    return CellField(table, field.h, (wid, hgt, d))


def cell_index(cf: CellField, p: jax.Array):
    """Flat extended-cell index + per-axis fractional weights.

    Returns (ci_flat (N,), w0 (N,3)) with w0 = pm - floor(pm) (may lie
    outside [0,1] off-grid, matching the reference).
    """
    wid, hgt, d = cf.res
    pm = p / cf.h
    pos = jnp.floor(pm)
    w0 = (pm - pos).astype(p.dtype)
    res_arr = jnp.array([wid, hgt, d])
    ci = jnp.clip(pos.astype(jnp.int32), -1, res_arr - 1) + 1  # in [0, res]
    ci_flat = (ci[:, 2] * (hgt + 1) + ci[:, 1]) * (wid + 1) + ci[:, 0]
    return ci_flat, w0


def _corner_weights(w0):
    """(N, 8) trilinear weights and the per-axis (w1, w0) stacks."""
    wx = jnp.stack([1.0 - w0[:, 0], w0[:, 0]], axis=-1)  # (N, 2)
    wy = jnp.stack([1.0 - w0[:, 1], w0[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - w0[:, 2], w0[:, 2]], axis=-1)
    # corner = a + 2b + 4c
    w8 = (wz[:, :, None, None] * wy[:, None, :, None] * wx[:, None, None, :]
          ).reshape(w0.shape[0], 8)
    return w8, wx, wy, wz


def fetch(cf: CellField, p: jax.Array, mask=None):
    """One row gather per ray: (vals8 (N, 8), w0 (N, 3), ci (N,)).

    The single implementation used by every stepper (fast, checkpointed).
    Indices are clamped in cell_index — promise_in_bounds skips the
    per-element bounds logic (~15% faster gather on v5e).
    """
    ci_flat, w0 = cell_index(cf, p)
    vals = cf.flat.at[ci_flat].get(mode="promise_in_bounds")
    if mask is not None:
        vals = jnp.where(mask[:, None], vals, 0.0)
    return vals, w0, ci_flat


def eval_grad_from(vals: jax.Array, w0: jax.Array, h):
    """Trilinear value + gradient from fetched corner rows.

    Bit-for-bit the same math as grid.eval_grad (tests assert allclose at
    f64 tolerance).
    """
    n8 = vals.reshape(-1, 2, 2, 2)  # (N, c=z, b=y, a=x)
    wx = jnp.stack([1.0 - w0[:, 0], w0[:, 0]], axis=-1)
    wy = jnp.stack([1.0 - w0[:, 1], w0[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - w0[:, 2], w0[:, 2]], axis=-1)

    vy = jnp.einsum("nb,ncba->nca", wy, n8)
    vyz = jnp.einsum("nc,nca->na", wz, vy)     # (N, 2) over x corner
    n = jnp.einsum("na,na->n", wx, vyz)

    inv_h = 1.0 / h
    nx = (vyz[:, 1] - vyz[:, 0]) * inv_h

    vx = jnp.einsum("na,ncba->ncb", wx, n8)
    vxz = jnp.einsum("nc,ncb->nb", wz, vx)
    ny = (vxz[:, 1] - vxz[:, 0]) * inv_h

    vxy = jnp.einsum("nb,ncb->nc", wy, vx)
    nz = (vxy[:, 1] - vxy[:, 0]) * inv_h
    return n, jnp.stack([nx, ny, nz], axis=-1)


def eval_hess_from(vals: jax.Array, w0: jax.Array, h):
    """Off-diagonal Hessian entries from the same fetched rows."""
    v = vals.reshape(-1, 2, 2, 2)  # (N, z, y, x)
    w0x, w0y, w0z = w0[:, 0], w0[:, 1], w0[:, 2]

    def lerp(a, b, t):
        return a + t * (b - a)

    dxdy = lerp(
        v[:, 0, 1, 1] - v[:, 0, 1, 0] - v[:, 0, 0, 1] + v[:, 0, 0, 0],
        v[:, 1, 1, 1] - v[:, 1, 1, 0] - v[:, 1, 0, 1] + v[:, 1, 0, 0],
        w0z,
    )
    dxdz = lerp(
        v[:, 1, 0, 1] - v[:, 1, 0, 0] - v[:, 0, 0, 1] + v[:, 0, 0, 0],
        v[:, 1, 1, 1] - v[:, 1, 1, 0] - v[:, 0, 1, 1] + v[:, 0, 1, 0],
        w0y,
    )
    dydz = lerp(
        v[:, 1, 1, 0] - v[:, 0, 1, 0] - v[:, 1, 0, 0] + v[:, 0, 0, 0],
        v[:, 1, 1, 1] - v[:, 0, 1, 1] - v[:, 1, 0, 1] + v[:, 0, 0, 1],
        w0x,
    )
    inv_h2 = 1.0 / (h * h)
    return dxdy * inv_h2, dxdz * inv_h2, dydz * inv_h2


def splat_rows(w0, val, grad, h, mask=None):
    """Per-corner contributions as (N, 8) rows — the transpose of
    eval_grad_from wrt the corner values (see grid._splat_corner_values)."""
    n = w0.shape[0]
    wx = jnp.stack([1.0 - w0[:, 0], w0[:, 0]], axis=-1)   # (N, 2)
    wy = jnp.stack([1.0 - w0[:, 1], w0[:, 1]], axis=-1)
    wz = jnp.stack([1.0 - w0[:, 2], w0[:, 2]], axis=-1)
    sgn = jnp.stack([-jnp.ones(n, w0.dtype), jnp.ones(n, w0.dtype)], axis=-1)

    inv_h = 1.0 / h
    gx = grad[:, 0] * inv_h
    gy = grad[:, 1] * inv_h
    gz = grad[:, 2] * inv_h

    # (N, c, b, a)
    contrib = (
        val[:, None, None, None] * wz[:, :, None, None] * wy[:, None, :, None] * wx[:, None, None, :]
        + gx[:, None, None, None] * wz[:, :, None, None] * wy[:, None, :, None] * sgn[:, None, None, :]
        + gy[:, None, None, None] * wz[:, :, None, None] * sgn[:, None, :, None] * wx[:, None, None, :]
        + gz[:, None, None, None] * sgn[:, :, None, None] * wy[:, None, :, None] * wx[:, None, None, :]
    ).reshape(n, 8)
    if mask is not None:
        contrib = jnp.where(mask[:, None], contrib, 0.0)
    return contrib


def zero_cell_grad(cf: CellField) -> jax.Array:
    d1, h1, w1, _ = cf.table.shape
    return jnp.zeros((d1 * h1 * w1, 8), dtype=cf.table.dtype)


def scatter_rows(cell_grad: jax.Array, ci_flat: jax.Array, contrib: jax.Array):
    """One contiguous row scatter-add per ray (indices pre-clamped)."""
    return cell_grad.at[ci_flat].add(contrib, mode="promise_in_bounds")


def fold_cell_grad(cell_grad: jax.Array, cf: CellField) -> jax.Array:
    """Un-replicate the cell-gradient table into the voxel gradient.

    Transpose of build_cell_table: corner (a,b,c) of cell (cx,cy,cz) reads
    P[cz+c, cy+b, cx+a] of the edge-padded volume, so fold each corner slice
    back into a padded accumulator and collapse the pad (edge-pad transpose:
    the two outer pad layers add into the boundary voxels).
    """
    wid, hgt, d = cf.res
    cg = cell_grad.reshape(d + 1, hgt + 1, wid + 1, 8)
    gp = jnp.zeros((d + 2, hgt + 2, wid + 2), dtype=cell_grad.dtype)
    k = 0
    for c in range(2):
        for b in range(2):
            for a in range(2):
                gp = gp.at[c:c + d + 1, b:b + hgt + 1, a:a + wid + 1].add(
                    cg[..., k])
                k += 1

    # collapse edge padding: transpose of P[i] = data[clip(i-1, 0, res-1)] —
    # the two outer pad layers add into the boundary voxels
    def collapse(axis, arr):
        n = arr.shape[axis]
        first = jax.lax.index_in_dim(arr, 0, axis, keepdims=False)
        last = jax.lax.index_in_dim(arr, n - 1, axis, keepdims=False)
        core = jax.lax.slice_in_dim(arr, 1, n - 1, axis=axis)
        idx0 = [slice(None)] * core.ndim
        idx0[axis] = 0
        idxl = [slice(None)] * core.ndim
        idxl[axis] = core.shape[axis] - 1
        core = core.at[tuple(idx0)].add(first)
        core = core.at[tuple(idxl)].add(last)
        return core

    out = gp
    for ax in range(3):
        out = collapse(ax, out)
    return out  # (d, hgt, wid)

"""RBF / multilinear scalar-field toolkit on uniform grids (n-D, n in 1..3).

Functional JAX twin of the reference's pure-torch Grid (core/grid.py): a 4^n
RBF stencil with tent or cubic-B-spline kernels for value+gradient queries and
splatting, plus 2^n multilinear Get/Splat.  Used by the sensor models (image
splatting with tent weights) and by texture-based losses.

Differences from the reference, by design:
* functional — splats return a new :class:`RbfGrid` instead of mutating;
* mask-and-zero instead of boolean compression (static shapes for jit/SPMD);
* out-of-range stencil corners are clipped per-axis (the reference clips all
  axes with res[0], core/grid.py:51 — identical on the square/cubic grids it
  is used with).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_SQRT2 = 1.4142135623730951


def rbf_tent(r):
    """Tent kernel on the stencil radius (core/grid.py:76-81)."""
    w = jnp.clip(_SQRT2 - r, min=0.0)
    wx = -(r < _SQRT2).astype(r.dtype)
    return w, wx, 0.0


def rbf_cubic(r):
    """Cubic B-spline kernel and derivative (core/grid.py:83-98)."""
    s = jnp.sign(r)
    r = jnp.abs(r)
    m12 = (r > 1) & (r < 2)
    m1 = r <= 1
    vals = jnp.where(m12, (1.0 / 6.0) * (2.0 - r) ** 3, 0.0)
    vx = jnp.where(m12, -s * 0.5 * (2.0 - r) ** 2, 0.0)
    vals = jnp.where(m1, (2.0 / 3.0) - r ** 2 + 0.5 * r ** 3, vals)
    vx = jnp.where(m1, s * (-2.0 * r + 1.5 * r ** 2), vx)
    return vals, vx, 0.0


class RbfGrid(NamedTuple):
    """Scalar field with accumulation weights; ``scene`` indexed [i0, i1, ...]
    where point component k indexes axis k (torch Grid convention)."""

    scene: jax.Array
    weights: jax.Array
    h: jax.Array | float

    @staticmethod
    def create(scene: jax.Array, h) -> "RbfGrid":
        return RbfGrid(scene, jnp.zeros_like(scene), h)

    def render(self) -> jax.Array:
        """scene / weights where weights are nonzero (core/grid.py:30-34)."""
        mask = ~jnp.isclose(self.weights, 0.0)
        return jnp.where(mask, self.scene / jnp.where(mask, self.weights, 1.0), self.scene)


def _corner_offsets(ndim: int, size: int):
    return list(itertools.product(range(size), repeat=ndim))


def _gather(scene: jax.Array, idx_list) -> jax.Array:
    """Gather scene values at per-axis index arrays (each (C, N)), clipped."""
    res = scene.shape
    capped = [jnp.clip(ix, 0, res[ax] - 1) for ax, ix in enumerate(idx_list)]
    return scene[tuple(capped)]  # (C, N)


def _index_values(grid: RbfGrid, x: jax.Array):
    """4^n stencil around x (core/grid.py:37-64).

    Returns (fi (N, C), r (N, C), dx_nm (N, C, D), idx per-axis list of (C, N)).
    """
    ndim = x.shape[1]
    norm_x = x / grid.h - 0.5
    x1 = jnp.floor(norm_x).astype(jnp.int32)  # (N, D)

    offsets = jnp.array(_corner_offsets(ndim, 4), dtype=jnp.int32)  # (C, D)
    # per-axis corner index: x1[:, d] - 1 + offset  -> (C, N)
    idx = [(x1[:, d][None, :] - 1 + offsets[:, d][:, None]) for d in range(ndim)]

    fi = _gather(grid.scene, idx)  # (C, N)
    fi = jnp.swapaxes(fi, 0, 1)  # (N, C)

    idx_stack = jnp.stack(idx, axis=-1)  # (C, N, D)
    dx = norm_x[None, :, :] - idx_stack.astype(norm_x.dtype)  # (C, N, D)
    dx = jnp.swapaxes(dx, 0, 1)  # (N, C, D)

    # NaN-safe norm: d(sqrt(x))/dx at 0 is inf and poisons the splat VJP
    # when a query lands exactly on a grid node (sensor-image losses
    # differentiate through this); guard the sqrt so value AND gradient are
    # exact (0) at r == 0.
    sq = jnp.sum(dx * dx, axis=-1)  # (N, C)
    zero = sq <= 0.0
    r = jnp.sqrt(jnp.where(zero, 1.0, sq))
    r = jnp.where(zero, 0.0, r)
    r0 = jnp.where(jnp.isclose(r, 0.0), 1.0, r)
    dx_nm = dx / r0[:, :, None]
    return fi, r, dx_nm, idx


def get(grid: RbfGrid, x: jax.Array, sigmoid: bool = False, cubic: bool = False):
    """RBF value + gradient (core/grid.py:100-124)."""
    fi, r, dx, _ = _index_values(grid, x)
    w, wx, _ = (rbf_cubic if cubic else rbf_tent)(r)

    ws = w.sum(axis=1)
    f = jnp.einsum("nc,nc->n", fi, w) / ws

    fx = jnp.einsum("nc,ncd->nd", wx * fi, dx)
    fx = fx - f[:, None] * jnp.einsum("nc,ncd->nd", wx, dx)
    fx = fx / ws[:, None]

    if sigmoid:
        sf = jax.nn.sigmoid(f)
        sfx = (sf[:, None] ** 2) * jnp.exp(-f)[:, None] * fx / grid.h
        return sf + 1, sfx
    return f, fx / grid.h


def get_hessian(grid: RbfGrid, x: jax.Array):
    """Jacobian of (f, fx) wrt x via jacfwd (core/grid.py:126-131)."""
    return jax.jacfwd(lambda p: get(grid, p))(x)


def splat(grid: RbfGrid, x: jax.Array, f: jax.Array, average: bool = True,
          mask: jax.Array | None = None) -> RbfGrid:
    """Tent-RBF splat of per-point values (core/grid.py:133-151).

    average=False normalizes each point's stencil weights to sum 1.
    ``mask`` (N,) optionally zeroes whole points (for padded ray batches).
    """
    fi, r, dx, idx = _index_values(grid, x)
    w, _, _ = rbf_tent(r)  # (N, C)

    res = grid.scene.shape
    valid = jnp.ones(w.shape, dtype=bool)
    for ax, ix in enumerate(idx):  # ix: (C, N)
        ixn = jnp.swapaxes(ix, 0, 1)
        valid &= (ixn >= 0) & (ixn < res[ax])
    if mask is not None:
        valid &= mask[:, None]

    if not average:
        we = w / w.sum(axis=1, keepdims=True)
    else:
        we = w
    we = jnp.where(valid, we, 0.0)
    fe = jnp.where(valid, f[:, None] * we, 0.0)

    capped = tuple(jnp.clip(jnp.swapaxes(ix, 0, 1), 0, res[ax] - 1)
                   for ax, ix in enumerate(idx))
    scene = grid.scene.at[capped].add(fe)
    weights = grid.weights.at[capped].add(we)
    return RbfGrid(scene, weights, grid.h)


def splat_grad(grid: RbfGrid, x: jax.Array, f: jax.Array, fx: jax.Array) -> RbfGrid:
    """Value+gradient splat via 3 offset value-splats (core/grid.py:153-164)."""
    sq = jnp.sum(fx * fx, axis=-1)
    r = jnp.sqrt(jnp.where(sq <= 0.0, 1.0, sq))
    r = jnp.where(sq <= 0.0, 0.0, r)
    r0 = jnp.where(jnp.isclose(r, 0.0), 1.0, r)
    dx = grid.h * (fx / r0[:, None])
    ff = grid.h * (f + r)
    fb = grid.h * (f - r)
    grid = splat(grid, x, f)
    grid = splat(grid, x + dx, ff)
    grid = splat(grid, x - dx, fb)
    return grid


def solve_grad(grid: RbfGrid, x: jax.Array, f: jax.Array, fx: jax.Array) -> RbfGrid:
    """Per-point least-squares fit of stencil values (core/grid.py:166-185)."""
    fi, r, dx, idx = _index_values(grid, x)
    w, wx, _ = rbf_tent(r)
    ws = w.sum(axis=1)

    a1 = wx[:, :, None] * dx  # (N, C, D)
    a2 = w[:, :, None] * (jnp.einsum("nc,ncd->nd", wx, dx)[:, None, :] / ws[:, None, None])
    M = jnp.concatenate([w[:, :, None], a1 - a2], axis=-1)  # (N, C, 1+D)
    M = jnp.swapaxes(M, 1, 2) / ws[:, None, None]  # (N, 1+D, C)
    b = jnp.concatenate([f[:, None], fx], axis=-1)  # (N, 1+D)

    Mi = jnp.linalg.pinv(M)
    v = jnp.einsum("nck,nk->nc", Mi, b)  # (N, C)

    res = grid.scene.shape
    valid = jnp.ones(v.shape, dtype=bool)
    for ax, ix in enumerate(idx):
        ixn = jnp.swapaxes(ix, 0, 1)
        valid &= (ixn >= 0) & (ixn < res[ax])
    v = jnp.where(valid, v, 0.0)
    ones = jnp.where(valid, 1.0, 0.0)

    capped = tuple(jnp.clip(jnp.swapaxes(ix, 0, 1), 0, res[ax] - 1)
                   for ax, ix in enumerate(idx))
    scene = grid.scene.at[capped].add(v)
    weights = grid.weights.at[capped].add(ones)
    return RbfGrid(scene, weights, grid.h)


def _linear_stencil(grid: RbfGrid, x: jax.Array):
    """2^n stencil with clipped weights (core/grid.py:227-259)."""
    ndim = x.shape[1]
    norm_x = x / grid.h
    x0 = jnp.floor(norm_x).astype(jnp.int32)
    w0 = jnp.clip(norm_x - x0.astype(norm_x.dtype), 0.0, 1.0)

    offsets = jnp.array(_corner_offsets(ndim, 2), dtype=jnp.int32)  # (C, D)
    idx = [(x0[:, d][None, :] + offsets[:, d][:, None]) for d in range(ndim)]  # (C, N)
    # per-corner weight along each axis: offset 0 -> 1-w0, offset 1 -> w0
    w_ind = []
    for d in range(ndim):
        wlo = (1.0 - w0[:, d])[None, :]
        whi = w0[:, d][None, :]
        w_ind.append(jnp.where(offsets[:, d][:, None] == 0, wlo, whi))  # (C, N)
    return norm_x, idx, w_ind, offsets


def get_linear(grid: RbfGrid, x: jax.Array):
    """Multilinear value + weight-differenced gradient (core/grid.py:227-273)."""
    ndim = x.shape[1]
    norm_x, idx, w_ind, offsets = _linear_stencil(grid, x)

    fi = _gather(grid.scene, idx)  # (C, N)
    wi = jnp.ones_like(fi)
    for d in range(ndim):
        wi = wi * w_ind[d]
    f = jnp.einsum("cn,cn->n", fi, wi)

    sgn = [jnp.where(offsets[:, d][:, None] == 0, -1.0, 1.0) for d in range(ndim)]
    fx = []
    for d in range(ndim):
        wd = sgn[d]
        for other in range(ndim):
            if other != d:
                wd = wd * w_ind[other]
        fx.append(jnp.einsum("cn,cn->n", fi, wd))
    return f, jnp.stack(fx, axis=-1) / grid.h


def splat_linear(grid: RbfGrid, x: jax.Array, f: jax.Array, fx: jax.Array,
                 mask: jax.Array | None = None) -> RbfGrid:
    """Multilinear adjoint splat of value + gradient (core/grid.py:275-315)."""
    ndim = x.shape[1]
    norm_x, idx, w_ind, offsets = _linear_stencil(grid, x)
    res = grid.scene.shape

    wp = jnp.ones_like(w_ind[0])
    for d in range(ndim):
        wp = wp * w_ind[d]

    sgn = [jnp.where(offsets[:, d][:, None] == 0, -1.0, 1.0) for d in range(ndim)]
    dot = jnp.zeros_like(wp)
    for d in range(ndim):
        wd = sgn[d]
        for other in range(ndim):
            if other != d:
                wd = wd * w_ind[other]
        dot = dot + fx[:, d][None, :] * wd
    dot = grid.h * dot

    valid = jnp.all((norm_x >= 0) & (norm_x < res[0]), axis=-1)  # (N,)
    if mask is not None:
        valid &= mask
    contrib = jnp.where(valid[None, :], wp * f[None, :] + dot, 0.0)
    wcontrib = jnp.where(valid[None, :], wp, 0.0)

    capped = tuple(jnp.clip(ix, 0, res[ax] - 1) for ax, ix in enumerate(idx))
    scene = grid.scene.at[capped].add(contrib)
    weights = grid.weights.at[capped].add(wcontrib)
    return RbfGrid(scene, weights, grid.h)


def get_spline(grid: RbfGrid, x: jax.Array):
    """Separable cubic-B-spline value + gradient (core/grid.py:187-223)."""
    ndim = x.shape[1]
    norm_x = x / grid.h
    x0 = jnp.floor(norm_x).astype(jnp.int32)

    offsets = jnp.array(_corner_offsets(ndim, 4), dtype=jnp.int32)  # (C, D)
    idx = [(x0[:, d][None, :] - 1 + offsets[:, d][:, None]) for d in range(ndim)]

    # weight/deriv per axis per stencil slot s in {-1,0,1,2}: rbf_cubic(frac - (s-1))
    w_ind, w_indx = [], []
    for d in range(ndim):
        t = norm_x[:, d] - x0[:, d].astype(norm_x.dtype)
        slot = (offsets[:, d] - 1).astype(norm_x.dtype)[:, None]  # (C, 1)
        wv, wvx, _ = rbf_cubic(t[None, :] - slot)
        w_ind.append(jnp.clip(wv, 0.0, 1.0))
        w_indx.append(wvx)

    fi = _gather(grid.scene, idx)  # (C, N)
    wi = jnp.ones_like(fi)
    for d in range(ndim):
        wi = wi * w_ind[d]
    f = jnp.einsum("cn,cn->n", fi, wi)

    fx = []
    for d in range(ndim):
        wd = w_indx[d]
        for other in range(ndim):
            if other != d:
                wd = wd * w_ind[other]
        fx.append(jnp.einsum("cn,cn->n", fi, wd))
    return f, jnp.stack(fx, axis=-1) / grid.h


def render_gradient(grid: RbfGrid, linear: bool = False):
    """Gradient field sampled at every grid node (core/grid.py:66-74)."""
    import numpy as np

    axes = [grid.h * jnp.arange(r, dtype=grid.scene.dtype)
            for r in grid.scene.shape]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    z = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
    if linear:
        f, fx = get_linear(grid, z)
    else:
        f, fx = get(grid, z)
    return fx.reshape(*grid.scene.shape, grid.scene.ndim)

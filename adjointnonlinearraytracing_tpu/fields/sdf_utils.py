"""SDF-surface ray spawning (reference: core/grid.py:333-377).

``get_pts_sdf`` projects random points onto the zero level set of a voxel SDF
(walking along the SDF gradient) and returns surface positions plus inward
directions — used to spawn rays for the SDF-bounded experiments.
``get_opp_pts`` marches points through the interior to the opposite surface.

The reference uses data-dependent Python loops with early exit
(grid.py:351-357); here the iteration is a `lax.while_loop` with per-point
convergence masks (jit-friendly, same fixed-point).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .rbf import RbfGrid, get_linear


def get_pts_sdf(key, sdf: jax.Array, nrays: int, width: float):
    """Project random points onto the SDF surface; returns (pos, vel).

    ``sdf`` is a (res, res, res) distance volume on span [0, width] in
    *voxel units* (world distance / h — the reference's convention, see the
    h*sdf scaling at grid.py:338); the returned ``vel`` is the inward surface
    direction (-grad).  With a sphere SDF all returned points land within
    0.05 of the surface (tests).
    """
    res = sdf.shape[0]
    h = width / (res - 1)
    pts = width * jax.random.uniform(key, (nrays, 3), dtype=sdf.dtype)

    vol = RbfGrid.create(h * sdf, h)

    dist, distx = get_linear(vol, pts)
    dnorm = jnp.linalg.norm(distx, axis=-1, keepdims=True)
    vel = distx / jnp.where(dnorm == 0, 1.0, dnorm)

    pos = pts - dist[:, None] * vel
    pos = pos - h * distx / 10

    eps = 1.0 / 10

    def cond(state):
        i, pos, mask = state
        return (i < 1000) & jnp.any(mask)

    def body(state):
        i, pos, mask = state
        dist, _ = get_linear(vol, pos)
        step = eps * dist[:, None] * vel / (i + 1)
        pos = jnp.where(mask[:, None], pos - step, pos)
        dist2, _ = get_linear(vol, pos)
        mask = mask & (dist2 > -1e-6)
        return (i + 1, pos, mask)

    dist0, _ = get_linear(vol, pos)
    mask0 = dist0 > -1e-6
    _, pos, _ = lax.while_loop(cond, body, (0, pos, mask0))
    return pos, -vel


def get_opp_pts(sdf: jax.Array, pts: jax.Array, v: jax.Array, width: float):
    """March interior points along v to the opposite surface (grid.py:361-377)."""
    res = sdf.shape[0]
    h = width / (res - 1)
    vol = RbfGrid.create(sdf, h)

    dist0, _ = get_linear(vol, pts)
    mask0 = dist0 < 0
    max_iters = res * 3

    def cond(state):
        i, pos, mask = state
        return (i < max_iters) & jnp.any(mask)

    def body(state):
        i, pos, mask = state
        pos = jnp.where(mask[:, None], pos + h * v / 2, pos)
        dist, _ = get_linear(vol, pos)
        mask = mask & (dist < 0)
        return (i + 1, pos, mask)

    _, pos, _ = lax.while_loop(cond, body, (0, pts, mask0))
    return pos

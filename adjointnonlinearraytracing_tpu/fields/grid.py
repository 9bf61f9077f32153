"""Regular-grid scalar field on a uniform voxel lattice (TPU-native).

Semantics match the reference native volume (/root/reference/src/volume.cpp):

* The field lives on ``[0, (res-1)*h]^3``; voxel spacing ``h``.
* ``eval_grad`` is trilinear interpolation with the analytic gradient obtained
  by differencing the interpolation weights (volume.cpp:101-181).
* ``eval_hess`` is the off-diagonal-only trilinear Hessian — the diagonal of a
  trilinear interpolant is identically zero (volume.cpp:40-99).
* ``splat`` is the exact transpose of ``eval_grad`` with respect to the voxel
  data: it scatter-adds ``val * B_i(p) + grad . dB_i(p)`` for the 8 stencil
  basis functions B_i.  NOTE: the reference omits the 1/h factor on the
  gradient part of the splat (volume.cpp:227-234) while its cylinder twin
  keeps it (cylinder_volume.cpp:146-147); we implement the exact transpose
  (with 1/h) so the adjoint gradient matches autodiff to machine precision.
  This is verified by the dot-product transpose tests in tests/test_fields.py.
* Out-of-range stencil indices are clamped to the border per corner
  (volume.cpp:131-132); a masked-out lane contributes (0, 0) exactly like a
  masked enoki gather.
* Data layout: ``data[z, y, x]`` with p = (x, y, z), i.e. the x component of a
  position indexes the fastest-varying axis — the flat index is
  ``(z*H + y)*W + x`` (volume.cpp:134-141).

Everything here is shape-static, mask-based, and jit/vmap/shard_map friendly;
gathers are single fused XLA gathers of the (8, N) stencil.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GridField(NamedTuple):
    """A scalar voxel field: ``data[z, y, x]`` with spacing ``h``.

    ``data`` may be any float dtype; ``h`` is a scalar (traced or python
    float).  The physical extent per axis is ``(res_axis - 1) * h``.
    """

    data: jax.Array  # (D, H, W) = (res_z, res_y, res_x)
    h: jax.Array | float

    @property
    def res(self) -> Tuple[int, int, int]:
        d, hh, w = self.data.shape
        return (w, hh, d)  # (res_x, res_y, res_z)

    @staticmethod
    def from_flat(flat: jax.Array, res: Tuple[int, int, int], h) -> "GridField":
        """Build from a flat buffer with reference flat-index convention."""
        w, hh, d = res
        return GridField(flat.reshape(d, hh, w), h)


def _stencil(field: GridField, p: jax.Array):
    """Common 8-corner stencil setup.

    Returns (flat_idx (2,2,2,N), wx, wy, wz each (2,N)) where index a in the
    first axis selects the x-corner, b the y-corner, c the z-corner and the
    weight stacks are ordered (w1, w0) so that ``w[a]`` is the weight of
    corner a (corner 0 gets 1-frac).
    """
    data = field.data
    d, hgt, wid = data.shape
    res = jnp.array([wid, hgt, d], dtype=jnp.int32)

    pm = p / field.h
    pos = jnp.floor(pm).astype(jnp.int32)
    w0 = pm - pos.astype(pm.dtype)  # fractional offset (may exceed [0,1] off-grid)
    w1 = 1.0 - w0
    pos0 = jnp.clip(pos, 0, res - 1)
    pos1 = jnp.clip(pos + 1, 0, res - 1)

    # (2, N) per axis: corner 0 -> pos0, corner 1 -> pos1
    cx = jnp.stack([pos0[:, 0], pos1[:, 0]])
    cy = jnp.stack([pos0[:, 1], pos1[:, 1]])
    cz = jnp.stack([pos0[:, 2], pos1[:, 2]])

    # flat index (a, b, c, N) = (cz*H + cy)*W + cx
    idx = (cz[None, None, :, :] * hgt + cy[None, :, None, :]) * wid + cx[:, None, None, :]

    wx = jnp.stack([w1[:, 0], w0[:, 0]])
    wy = jnp.stack([w1[:, 1], w0[:, 1]])
    wz = jnp.stack([w1[:, 2], w0[:, 2]])
    return idx, wx, wy, wz


def eval_grad(field: GridField, p: jax.Array, mask: jax.Array | None = None):
    """Trilinear value + analytic gradient at points ``p`` (N, 3).

    Masked-out lanes gather 0 (enoki masked-gather semantics), yielding
    ``(0, 0)`` so a masked ray drifts in a straight line in the stepper.
    Returns ``(n (N,), grad (N, 3))``; grad includes the 1/h factor
    (volume.cpp:178).
    """
    idx, wx, wy, wz = _stencil(field, p)
    flat = field.data.reshape(-1)
    v = flat[idx]  # (2,2,2,N)
    if mask is not None:
        v = jnp.where(mask[None, None, None, :], v, 0.0)

    # value: sum_{a,b,c} wx[a] wy[b] wz[c] v[a,b,c]
    vy = jnp.einsum("bN,abcN->acN", wy, v)         # contract y
    vyz = jnp.einsum("cN,acN->aN", wz, vy)         # contract z -> (2, N) over x-corner
    n = jnp.einsum("aN,aN->N", wx, vyz)

    inv_h = 1.0 / field.h
    nx = (vyz[1] - vyz[0]) * inv_h

    vx = jnp.einsum("aN,abcN->bcN", wx, v)         # contract x -> (2,2,N) over (y,z)
    vxz = jnp.einsum("cN,bcN->bN", wz, vx)
    ny = (vxz[1] - vxz[0]) * inv_h

    vxy = jnp.einsum("bN,bcN->cN", wy, vx)
    nz = (vxy[1] - vxy[0]) * inv_h

    return n, jnp.stack([nx, ny, nz], axis=-1)


def eval_hess(field: GridField, p: jax.Array, mask: jax.Array | None = None):
    """Off-diagonal trilinear Hessian entries ``(dxdy, dxdz, dydz)``.

    Mirrors volume.cpp:79-98 (including the 1/h^2 scale). The diagonal is 0
    for trilinear interpolation. Use :func:`hess_matvec` to apply H @ mu.
    """
    idx, wx, wy, wz = _stencil(field, p)
    flat = field.data.reshape(-1)
    v = flat[idx]  # (a=x, b=y, c=z, N)
    if mask is not None:
        v = jnp.where(mask[None, None, None, :], v, 0.0)

    w0z = wz[1]
    w0y = wy[1]
    w0x = wx[1]

    # lerp(f0, f1, t) = f0 + t*(f1-f0)
    def lerp(a, b, t):
        return a + t * (b - a)

    dxdy = lerp(
        v[1, 1, 0] - v[0, 1, 0] - v[1, 0, 0] + v[0, 0, 0],
        v[1, 1, 1] - v[0, 1, 1] - v[1, 0, 1] + v[0, 0, 1],
        w0z,
    )
    dxdz = lerp(
        v[1, 0, 1] - v[0, 0, 1] - v[1, 0, 0] + v[0, 0, 0],
        v[1, 1, 1] - v[0, 1, 1] - v[1, 1, 0] + v[0, 1, 0],
        w0y,
    )
    dydz = lerp(
        v[0, 1, 1] - v[0, 0, 1] - v[0, 1, 0] + v[0, 0, 0],
        v[1, 1, 1] - v[1, 0, 1] - v[1, 1, 0] + v[1, 0, 0],
        w0x,
    )
    inv_h2 = 1.0 / (field.h * field.h)
    return dxdy * inv_h2, dxdz * inv_h2, dydz * inv_h2


def hess_matvec(hess, mu: jax.Array) -> jax.Array:
    """Apply the symmetric zero-diagonal Hessian to vectors ``mu`` (N, 3)."""
    dxdy, dxdz, dydz = hess
    return jnp.stack(
        [
            dxdy * mu[:, 1] + dxdz * mu[:, 2],
            dxdy * mu[:, 0] + dydz * mu[:, 2],
            dxdz * mu[:, 0] + dydz * mu[:, 1],
        ],
        axis=-1,
    )


def _splat_corner_values(field: GridField, p, val, grad, mask):
    """Per-corner scatter contributions for the transpose of eval_grad."""
    idx, wx, wy, wz = _stencil(field, p)
    inv_h = 1.0 / field.h

    # value part: val * wx[a] wy[b] wz[c]
    # grad part:  (gx * sa + ...) with sign(+/-) replacing the weight of that axis
    sgn = jnp.stack([-jnp.ones_like(wx[0]), jnp.ones_like(wx[0])])  # (2, N)
    gx = grad[:, 0] * inv_h
    gy = grad[:, 1] * inv_h
    gz = grad[:, 2] * inv_h

    contrib = (
        val[None, None, None, :] * wx[:, None, None, :] * wy[None, :, None, :] * wz[None, None, :, :]
        + gx[None, None, None, :] * sgn[:, None, None, :] * wy[None, :, None, :] * wz[None, None, :, :]
        + gy[None, None, None, :] * wx[:, None, None, :] * sgn[None, :, None, :] * wz[None, None, :, :]
        + gz[None, None, None, :] * wx[:, None, None, :] * wy[None, :, None, :] * sgn[None, None, :, :]
    )
    if mask is not None:
        contrib = jnp.where(mask[None, None, None, :], contrib, 0.0)
    return idx, contrib


def splat_delta(field: GridField, p: jax.Array, val: jax.Array, grad: jax.Array,
                mask: jax.Array | None = None) -> jax.Array:
    """Return the flat voxel-space delta of splatting ``(val, grad)`` at ``p``.

    Exact transpose of ``eval_grad``: for any voxel buffer u,
    ``<splat_delta(p, val, grad), u> == val * n_u(p) + grad . grad_u(p)``.
    One fused XLA scatter-add of the (8, N) stencil (volume.cpp:182-244).
    """
    idx, contrib = _splat_corner_values(field, p, val, grad, mask)
    nvox = field.data.size
    out = jnp.zeros((nvox,), dtype=field.data.dtype)
    return out.at[idx.reshape(-1)].add(contrib.reshape(-1))


def splat(field: GridField, p, val, grad, mask=None) -> GridField:
    """Functional splat: returns a new field with contributions accumulated."""
    delta = splat_delta(field, p, val, grad, mask)
    return GridField(field.data + delta.reshape(field.data.shape), field.h)


def scatter_into(acc_flat: jax.Array, field: GridField, p, val, grad, mask=None) -> jax.Array:
    """Accumulate splat contributions into an existing flat buffer (hot path)."""
    idx, contrib = _splat_corner_values(field, p, val, grad, mask)
    return acc_flat.at[idx.reshape(-1)].add(contrib.reshape(-1))


def inbounds(field: GridField, p: jax.Array) -> jax.Array:
    """p strictly inside [0, (res-1)*h) per axis (volume.cpp:246-256)."""
    d, hgt, wid = field.data.shape
    res = jnp.array([wid, hgt, d], dtype=p.dtype)
    hi = (res - 1) * field.h
    return jnp.all((p >= 0) & (p < hi), axis=-1)


def escaped(field: GridField, p: jax.Array, v: jax.Array) -> jax.Array:
    """Outside the grid AND moving away, per axis (volume.cpp:258-271)."""
    d, hgt, wid = field.data.shape
    res = jnp.array([wid, hgt, d], dtype=p.dtype)
    hi = (res - 1) * field.h
    esc = ((p < 0) & (v < 0)) | ((p >= hi) & (v > 0))
    return jnp.any(esc, axis=-1)


def upres_volume(n: jax.Array, new_res) -> jax.Array:
    """Trilinearly resample a cubic volume to ``new_res`` (grid.py:318-330).

    Mirrors the reference: the source grid is placed on [0, 1]^ndim with
    spacing 1/(res-1) and sampled at ``linspace(0, 1, new_res)`` per axis.
    Works for 1D/2D/3D inputs.
    """
    if isinstance(new_res, int):
        new_res = (new_res,) * n.ndim
    nvox = max(n.shape[0] - 1, 1)
    h = 1.0 / nvox

    axes = [jnp.linspace(0.0, 1.0, r, dtype=n.dtype) for r in new_res]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    pts = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)  # (N, ndim)

    pm = pts / h
    pos = jnp.floor(pm).astype(jnp.int32)
    frac = pm - pos.astype(pm.dtype)

    res_arr = jnp.array(n.shape, dtype=jnp.int32)
    pos0 = jnp.clip(pos, 0, res_arr - 1)
    pos1 = jnp.clip(pos + 1, 0, res_arr - 1)

    out = jnp.zeros((pts.shape[0],), dtype=n.dtype)
    ndim = n.ndim
    flat = n.reshape(-1)
    # strides for C-order flat index
    strides = []
    s = 1
    for dim in reversed(n.shape):
        strides.append(s)
        s *= dim
    strides = jnp.array(list(reversed(strides)), dtype=jnp.int32)

    for corner in range(2 ** ndim):
        bits = [(corner >> (ndim - 1 - ax)) & 1 for ax in range(ndim)]
        idx = jnp.zeros(pts.shape[0], dtype=jnp.int32)
        w = jnp.ones(pts.shape[0], dtype=n.dtype)
        for ax, b in enumerate(bits):
            sel = pos1[:, ax] if b else pos0[:, ax]
            idx = idx + sel * strides[ax]
            w = w * (frac[:, ax] if b else (1.0 - frac[:, ax]))
        out = out + w * flat[idx]
    return out.reshape(new_res)


def snap_to_nodes(p: jax.Array, h, tol=None) -> jax.Array:
    """Snap coordinates lying within ``tol`` cells of a grid node onto it.

    Used by the adjoint reverse sweeps: re-integrated positions drift by
    O(eps) per step, and a forward position that lay *exactly* on a cell
    boundary (deterministic sources start on grid faces) can be reconstructed
    at -eps — flipping `inbounds`/`escaped` and silently dropping that step's
    gradient contribution.  Snapping restores the forward's cell assignment
    and masks; genuine positions move by at most tol*h (weight perturbation
    <= tol).  tol defaults per dtype: 1e-9 cells (f64), 1e-3 cells (f32).
    """
    pm = p / h
    if tol is None:
        tol = 1e-9 if pm.dtype == jnp.float64 else 1e-3
    r = jnp.round(pm)
    pm = jnp.where(jnp.abs(pm - r) <= tol, r, pm)
    return pm * h

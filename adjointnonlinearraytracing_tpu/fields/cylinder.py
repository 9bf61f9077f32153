"""Cylinder (radial-profile) refractive-index field.

TPU-native twin of the reference cylinder volume
(/root/reference/src/cylinder_volume.cpp): a 1D radial profile ``data[r]``
embedded in a cylinder whose axis is y, centered at x = z = radius.  The
radial spacing is ``h = radius / (res - 1)``.

* ``cyl_eval_grad``: 1D lerp along ``r = |(x,z) - (radius, radius)|`` with the
  gradient along the radial unit vector, zeroed within r < 1e-6
  (cylinder_volume.cpp:26-59).
* ``cyl_eval_hess``: ``(rx/r) * (I - xhat xhat^T)`` projected to the xz-plane
  (cylinder_volume.cpp:61-111).
* ``cyl_splat_delta``: exact transpose of eval_grad — value lerp weights plus
  the +/- (g . xhat)/h gradient pair (cylinder_volume.cpp:113-148; the
  reference cylinder splat already carries the 1/h factor, unlike the voxel
  volume — see fields/grid.py docstring).
* ``cyl_inbounds`` / ``cyl_escaped``: cylindrical bounds and
  outside-and-receding tests (cylinder_volume.cpp:150-170).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-6


class CylinderField(NamedTuple):
    data: jax.Array  # (res,) radial profile
    radius: jax.Array | float
    length: jax.Array | float

    @property
    def h(self):
        return self.radius / (self.data.shape[0] - 1)


def _radial(field: CylinderField, p: jax.Array):
    """Radial coordinate setup: returns (xs, r, rm, idx0, idx1, w0, w1)."""
    res = field.data.shape[0]
    xs = p - field.radius
    xs = xs.at[:, 1].set(0.0)
    r = jnp.linalg.norm(xs, axis=-1)
    h = field.radius / (res - 1)
    rm = r / h
    idx0 = jnp.clip(jnp.floor(rm).astype(jnp.int32), 0, res - 1)
    idx1 = jnp.clip(idx0 + 1, 0, res - 1)
    w0 = rm - idx0.astype(rm.dtype)
    w1 = 1.0 - w0
    return xs, r, h, idx0, idx1, w0, w1


def _safe_unit(xs: jax.Array, r: jax.Array) -> jax.Array:
    """normalize(xs) with the r ~ 0 singularity mapped to 0."""
    rsafe = jnp.where(r < _EPS, 1.0, r)
    xhat = xs / rsafe[:, None]
    return jnp.where((r < _EPS)[:, None], 0.0, xhat)


def cyl_eval_grad(field: CylinderField, p: jax.Array, mask: jax.Array | None = None):
    """1D radial lerp value + gradient along the radial direction.

    The reference gathers unmasked here (cylinder_volume.cpp:50-51); the mask
    argument is accepted for API symmetry and multiplies the outputs when
    given (used by the adjoint stepper so inactive lanes contribute nothing).
    """
    xs, r, h, idx0, idx1, w0, w1 = _radial(field, p)
    val0 = field.data[idx0]
    val1 = field.data[idx1]
    f = val0 * w1 + val1 * w0
    rx = (val1 - val0) / h
    fx = rx[:, None] * _safe_unit(xs, r)
    if mask is not None:
        f = jnp.where(mask, f, 0.0)
        fx = jnp.where(mask[:, None], fx, 0.0)
    return f, fx


def cyl_eval_hess(field: CylinderField, p: jax.Array, mask: jax.Array | None = None):
    """Hessian (rx/r)(I - xhat xhat^T) on the xz-plane; zero near the axis.

    Returned as the packed entries (hxx, hxz, hzz); all y rows/cols are zero
    (cylinder_volume.cpp:97-105). Apply with :func:`cyl_hess_matvec`.
    """
    xs, r, h, idx0, idx1, w0, w1 = _radial(field, p)
    val0 = field.data[idx0]
    val1 = field.data[idx1]
    rx = (val1 - val0) / h

    xhat = _safe_unit(xs, r)
    rsafe = jnp.where(r < _EPS, 1.0, r)
    scale = jnp.where(r < _EPS, 0.0, rx / rsafe)

    hxx = scale * (1.0 - xhat[:, 0] * xhat[:, 0])
    hxz = scale * (-(xhat[:, 0] * xhat[:, 2]))
    hzz = scale * (1.0 - xhat[:, 2] * xhat[:, 2])
    if mask is not None:
        hxx = jnp.where(mask, hxx, 0.0)
        hxz = jnp.where(mask, hxz, 0.0)
        hzz = jnp.where(mask, hzz, 0.0)
    return hxx, hxz, hzz


def cyl_hess_matvec(hess, mu: jax.Array) -> jax.Array:
    hxx, hxz, hzz = hess
    return jnp.stack(
        [
            hxx * mu[:, 0] + hxz * mu[:, 2],
            jnp.zeros_like(hxx),
            hxz * mu[:, 0] + hzz * mu[:, 2],
        ],
        axis=-1,
    )


def cyl_splat_delta(field: CylinderField, p: jax.Array, val: jax.Array,
                    grad: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Radial-profile delta for splatting (val, grad) at p; transpose of eval."""
    xs, r, h, idx0, idx1, w0, w1 = _radial(field, p)
    xhat = _safe_unit(xs, r)

    grad_val = jnp.einsum("nd,nd->n", grad, xhat)
    grad_val = jnp.where(r < _EPS, 0.0, grad_val)

    c0 = val * w1 - grad_val / h
    c1 = val * w0 + grad_val / h
    if mask is not None:
        c0 = jnp.where(mask, c0, 0.0)
        c1 = jnp.where(mask, c1, 0.0)

    out = jnp.zeros_like(field.data)
    out = out.at[idx0].add(c0)
    out = out.at[idx1].add(c1)
    return out


def cyl_inbounds(field: CylinderField, p: jax.Array) -> jax.Array:
    pl = p - field.radius
    r2 = pl[:, 0] ** 2 + pl[:, 2] ** 2
    inlength = (p[:, 1] < field.length) & (p[:, 1] >= 0)
    return (r2 < field.radius ** 2) & inlength


def cyl_escaped(field: CylinderField, p: jax.Array, v: jax.Array) -> jax.Array:
    pl = p - field.radius
    esc_length = ((p[:, 1] < 0) & (v[:, 1] < 0)) | ((p[:, 1] > field.length) & (v[:, 1] > 0))
    out_radius = (pl[:, 0] ** 2 + pl[:, 2] ** 2) >= field.radius ** 2
    esc_radius = (pl[:, 0] * v[:, 0] + pl[:, 2] * v[:, 2]) > 0
    return (out_radius & esc_radius) | esc_length


def upres_profile(n: jax.Array, new_res: int) -> jax.Array:
    """Linear resample of a 1D radial profile onto ``new_res`` points."""
    from .grid import upres_volume

    return upres_volume(n, (new_res,))


def upres_profile_midpoint(n: jax.Array) -> jax.Array:
    """Midpoint-insertion upsampling to 2*(res-1)+1 points.

    Matches the fiber experiment's hand-rolled upres (fiber_opt.py:60-68):
    even slots keep the old samples, odd slots get neighbor midpoints.
    """
    tween = (n[1:] + n[:-1]) / 2
    out = jnp.zeros((n.shape[0] - 1) * 2 + 1, dtype=n.dtype)
    out = out.at[::2].set(n)
    out = out.at[1::2].set(tween)
    return out


def cyl_render(field: CylinderField, res):
    """Sample the radial profile onto a 3D voxel image (cable.py:25-37)."""
    rx = jnp.linspace(0.0, 2 * field.radius, res[0])
    ry = jnp.linspace(0.0, field.length, res[1])
    rz = jnp.linspace(0.0, 2 * field.radius, res[2])
    X = jnp.meshgrid(rx, ry, rz, indexing="ij")
    pos = jnp.stack([x.reshape(-1) for x in X], axis=-1)
    n, _ = cyl_eval_grad(field, pos)
    return n.reshape(tuple(res))


def cyl_render2(field: CylinderField, res):
    """Axial 2D slice through the cylinder center (cable.py:39-58)."""
    if isinstance(res, int):
        res = (res, res)
    rx = jnp.linspace(0.0, 2 * field.radius, res[0])
    ry = jnp.linspace(0.0, field.length, res[1])
    X = jnp.meshgrid(rx, ry, indexing="ij")
    pos = jnp.stack([X[0].reshape(-1), X[1].reshape(-1),
                     jnp.ones(res[0] * res[1]) * field.radius], axis=-1)
    n, _ = cyl_eval_grad(field, pos)
    return n.reshape(tuple(res))

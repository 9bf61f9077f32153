"""Sensor models: plane propagation, image splatting, texture losses.

Functional JAX twins of /root/reference/core/sensor.py.  The nonlinear trace
ends at the volume boundary; these helpers propagate exit rays linearly to a
sensor plane (differentiably) and splat them into 2D images with tent-RBF
weights and |v.n| foreshortening, or bin far-field directions / 4D plenoptic
coordinates.  All splats accept an optional ``mask`` so padded/rejected rays
(see sources/sources.py) contribute nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import rbf


def trace_rays_to_plane(rays, plane):
    """Linear propagation to the plane: t = n.(p-x)/n.v (sensor.py:195-202).

    ``rays`` = (x, v) with shapes (N, 3); ``plane`` = (p, n) broadcastable to
    (N, 3).  Differentiable in all inputs.
    """
    x, v = rays
    p, n = plane
    p = jnp.broadcast_to(p, x.shape)
    n = jnp.broadcast_to(n, x.shape)
    t = jnp.einsum("nd,nd->n", n, p - x) / jnp.einsum("nd,nd->n", n, v)
    return x + t[:, None] * v, v


def get_tan_vecs(n, t=None):
    """Tangent frame for a plane normal (sensor.py:221-231).

    ``n`` is (1, 3) (a single plane); returns (t1, t2) each (1, 3).
    """
    if t is None:
        t2 = jnp.zeros_like(n)
        pick_x = jnp.abs(n[0, -1]) > 0.001
        t2 = t2.at[0, 0].set(jnp.where(pick_x, 1.0, 0.0))
        t2 = t2.at[0, -1].set(jnp.where(pick_x, 0.0, 1.0))
    else:
        t2 = t
    t1 = jnp.cross(n, t2)
    return t1, t2


def generate_sensor(rays, e, plane, res: int, span, tangent=None, mask=None):
    """Near-plane sensor image via tent-RBF splat with foreshortening
    (sensor.py:5-28).  ``e`` is per-ray emission (scalar or (N,)).
    Returns the (res, res) image."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane

    t, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t, t2], axis=0).T  # (3, 2)
    h = span / res
    sensor = rbf.RbfGrid.create(jnp.zeros((res, res), dtype=x.dtype), h)

    fs = jnp.abs(jnp.einsum("nd,nd->n", v, jnp.broadcast_to(n, v.shape)))
    xn = (x - p) @ T + span / 2

    e = jnp.broadcast_to(jnp.asarray(e, dtype=x.dtype), fs.shape)
    sensor = rbf.splat(sensor, xn, fs * e, average=False, mask=mask)
    return sensor.scene


def generate_inf_sensor(rays, e, plane, res: int, angle_span=120, tangent=None,
                        mask=None):
    """Far-field sensor: bin directions in sin-angle coords (sensor.py:31-53)."""
    x, v = rays
    p, n = plane

    v_norm = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    ang_cut = jnp.sin(0.5 * jnp.deg2rad(jnp.asarray(angle_span, dtype=x.dtype)))

    t1, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t1, t2], axis=0).T

    sensor = rbf.RbfGrid.create(jnp.zeros((res, res), dtype=x.dtype),
                                2 * ang_cut / res)
    vn = v_norm @ T + ang_cut
    fe = jnp.broadcast_to(jnp.asarray(e, dtype=x.dtype), (x.shape[0],))
    sensor = rbf.splat(sensor, vn, fe, average=False, mask=mask)
    return sensor.scene


def generate_pleno_sensor(rays, e, plane, bins, span, angle_span=120,
                          tangent=None, mask=None):
    """4D (position x direction) plenoptic binning (sensor.py:56-99)."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane

    h = span / bins[0]
    ang_cut = jnp.sin(0.5 * jnp.deg2rad(jnp.asarray(angle_span, dtype=x.dtype)))

    t1, t2 = get_tan_vecs(n, tangent)
    Tx = jnp.concatenate([t1, t2], axis=0).T
    Tv = jnp.concatenate([t1, -t2], axis=0).T

    xgrid = rbf.RbfGrid.create(jnp.zeros((bins[0], bins[1]), dtype=x.dtype), h)
    vgrid = rbf.RbfGrid.create(jnp.zeros((bins[2], bins[3]), dtype=x.dtype),
                               2 * ang_cut / bins[2])

    xn = (x - p) @ Tx + span / 2
    vn = v @ Tv + ang_cut

    _, rx, _, xidx = rbf._index_values(xgrid, xn)
    _, rv, _, vidx = rbf._index_values(vgrid, vn)

    # validity from the position stencil only (sensor.py:81-84)
    xvalid = jnp.ones(rx.shape, dtype=bool)
    for ax, ix in enumerate(xidx):
        ixn = jnp.swapaxes(ix, 0, 1)
        xvalid &= (ixn >= 0) & (ixn < bins[0])
    if mask is not None:
        xvalid &= mask[:, None]

    wx, _, _ = rbf.rbf_tent(rx)
    wv, _, _ = rbf.rbf_tent(rv)
    wxe = wx / wx.sum(axis=1, keepdims=True)
    wve = wv / wv.sum(axis=1, keepdims=True)

    fs = jnp.abs(jnp.einsum("nd,nd->n", v, jnp.broadcast_to(n, v.shape)))
    fe = jnp.broadcast_to(jnp.asarray(e, dtype=x.dtype), fs.shape) * fs

    # the reference pairs corner c of the position stencil with corner c of
    # the direction stencil (index_put_ with the concatenated index lists,
    # sensor.py:84-98) — a diagonal deposit, NOT the outer product
    contrib = jnp.where(xvalid, wxe * wve * fe[:, None], 0.0)  # (N, C)

    xib = [jnp.clip(jnp.swapaxes(ix, 0, 1), 0, bins[0] - 1) for ix in xidx]
    vib = [jnp.clip(jnp.swapaxes(ix, 0, 1), 0, bins[2] - 1) for ix in vidx]

    pleno = jnp.zeros(tuple(bins), dtype=x.dtype)
    pleno = pleno.at[xib[0], xib[1], vib[0], vib[1]].add(contrib)
    return pleno


def get_sdf_vals_near(rays, d_tex, plane, span, tangent=None):
    """Sample a distance texture at the plane-hit position (sensor.py:102-119)."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane
    res = d_tex.shape[0]
    h = span / res
    x_grid = rbf.RbfGrid.create(d_tex, h)
    t, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t, t2], axis=0).T
    xn = (x - p) @ T + span / 2
    disp_x, _ = rbf.get(x_grid, xn)
    return disp_x


def get_sdf_vals_far(rays, d_tex, plane, ang_span, tangent=None):
    """Sample a deflection texture at the exit direction (sensor.py:122-139)."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane
    res = d_tex.shape[0]
    ang_cut = jnp.sin(0.5 * jnp.deg2rad(jnp.asarray(ang_span, dtype=x.dtype)))
    h = 2 * ang_cut / res
    t1, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t1, t2], axis=0).T
    vn = v @ T + ang_cut
    x_grid = rbf.RbfGrid.create(d_tex, h)
    defl_x, _ = rbf.get(x_grid, vn)
    return defl_x


def get_disps_from_tex(rays, d_tex, plane, span, tangent=None):
    """Per-ray target displacement from a 2-channel texture (sensor.py:142-165)."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane
    res = d_tex.shape[0]
    h = span / res
    x_grid = rbf.RbfGrid.create(d_tex[..., 0], h)
    y_grid = rbf.RbfGrid.create(d_tex[..., 1], h)
    t, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t, t2], axis=0).T
    xn = (x - p) @ T + span / 2
    disp_x, _ = rbf.get(x_grid, xn)
    disp_y, _ = rbf.get(y_grid, xn)
    disps = jnp.stack([disp_x, disp_y], axis=-1) - span / 2
    disps3 = disps @ T.T  # (N, 2) @ (2, 3)
    return disps3 + p


def get_defls_from_tex(rays, d_tex, plane, span, tangent=None):
    """Per-ray target deflection direction from a texture (sensor.py:168-192)."""
    x, v = trace_rays_to_plane(rays, plane)
    p, n = plane
    res = d_tex.shape[0]
    h = span / res
    x_grid = rbf.RbfGrid.create(d_tex[..., 0], h)
    y_grid = rbf.RbfGrid.create(d_tex[..., 1], h)
    t, t2 = get_tan_vecs(n, tangent)
    T = jnp.concatenate([t, t2], axis=0).T
    xn = (x - p) @ T + span / 2
    defl_x = 2 * (rbf.get(x_grid, xn)[0] - 0.5)
    defl_y = 2 * (rbf.get(y_grid, xn)[0] - 0.5)
    defl_z = 1 - defl_x ** 2 - defl_y ** 2
    defls = jnp.stack([defl_x, defl_y, defl_z], axis=-1)
    frame = jnp.concatenate([t, t2, n], axis=0).T  # (3, 3)
    return defls @ frame.T


def refract(rays, plane, etai, etae=1.0):
    """Snell's-law refraction at the plane (sensor.py:205-218)."""
    x, v = rays
    p, n = plane
    n = jnp.broadcast_to(n, v.shape)
    cosi = jnp.einsum("nd,nd->n", v, n)
    eta = etai / etae
    k = 1 - eta ** 2 * (1 - cosi ** 2)
    refr = eta * v + (eta * cosi[:, None] - jnp.sqrt(jnp.maximum(k, 0.0))[:, None]) \
        * jnp.sign(cosi)[:, None] * n
    vout = jnp.where((k >= 1)[:, None], refr, 0.0)
    return x, vout

"""Ray-bundle generators (sources) and image/sensor helpers.

Functional JAX twins of /root/reference/core/source.py.  Every generator
returns initial conditions ``(x, v, planes)`` where ``planes`` is the per-ray
sensor-plane stack ``[plane_origin, plane_normal, plane_tangent]`` (N, 3, 3),
plus a boolean ``mask`` (N,) replacing the reference's row-dropping filters
(circle crops, hit-the-volume rejection): JAX/SPMD needs static shapes, so
rejected rays stay in the batch with ``mask=False`` and must be excluded from
losses/splats by the caller.  Random functions take an explicit PRNG ``key``
instead of the global torch RNG.

Angles are degrees (like the reference).  ``pixels`` is an (H, W) tuple and
``spp`` samples-per-pixel; batch size is ``H * W * spp`` (static).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Rays(NamedTuple):
    x: jax.Array        # (N, 3) positions
    v: jax.Array        # (N, 3) directions
    planes: jax.Array   # (N, 3, 3) [origin, normal, tangent]
    mask: jax.Array     # (N,) live-ray mask

    def astuple(self):
        return self.x, self.v, self.planes


def _full_mask(n):
    return jnp.ones((n,), dtype=bool)


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def rotate_ray(x: jax.Array, angle) -> jax.Array:
    """2D rotation by ``angle`` degrees (source.py:296-300)."""
    theta = jnp.deg2rad(jnp.asarray(angle, dtype=x.dtype))
    c, s = jnp.cos(theta), jnp.sin(theta)
    R = jnp.array([[1.0, 0.0], [0.0, 1.0]], dtype=x.dtype)
    R = jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])]).astype(x.dtype)
    return x @ R.T


def rotate_ray3(x: jax.Array, angle, vert: bool = False) -> jax.Array:
    """3D rotation about z (or x when vert) by degrees (source.py:303-312)."""
    theta = jnp.deg2rad(jnp.asarray(angle, dtype=x.dtype))
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    if vert:
        R = jnp.stack([
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, c, -s]),
            jnp.stack([zero, s, c]),
        ])
    else:
        R = jnp.stack([
            jnp.stack([c, -s, zero]),
            jnp.stack([s, c, zero]),
            jnp.stack([zero, zero, one]),
        ])
    return x @ R.T


def random_rotmat(key) -> jax.Array:
    """Uniform random SO(3) matrix (quaternion method; source.py:548-552)."""
    q = jax.random.normal(key, (4,))
    q = q / jnp.linalg.norm(q)
    w, x, y, z = q
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def random_rotate_ic(key, x, v, planes, span):
    """Rotate rays+planes by a random rotation about the volume center
    (source.py:555-563)."""
    R = random_rotmat(key).astype(x.dtype)
    c = span / 2
    xn = (x - c) @ R.T + c
    vn = v @ R.T
    sp = (planes[:, 0, :] - c) @ R.T + c
    sn = planes[:, 1, :] @ R.T
    st = planes[:, 2, :] @ R.T
    return xn, vn, jnp.stack([sp, sn, st], axis=1)


def rotate_ic(x, v, planes, angle, span, vert=False):
    """Rotate rays+planes by a fixed angle (source.py:566-573)."""
    xr = rotate_ray3(x, angle, vert=vert) + span / 2
    vr = rotate_ray3(v, angle, vert=vert)
    spr = rotate_ray3(planes[:, 0, :], angle, vert=vert) + span / 2.0
    snr = rotate_ray3(planes[:, 1, :], angle, vert=vert)
    strr = rotate_ray3(planes[:, 2, :], angle, vert=vert)
    return xr, vr, jnp.stack([spr, snr, strr], axis=1)


def hatbox_sample(key, v: jax.Array, angle) -> jax.Array:
    """Uniform directions in a cone of ``angle`` degrees around each v
    (Archimedes hat-box; source.py:531-545)."""
    n = v.shape[0]
    basis = jnp.array([[0.0, 0.0, 1.0]], dtype=v.dtype)
    rang = jnp.deg2rad(jnp.asarray(angle, dtype=v.dtype)) / 2
    dist = jnp.cos(rang)
    kz, kt = jax.random.split(key)
    z = jax.random.uniform(kz, (n,), dtype=v.dtype) * (1 - dist) + dist
    theta = 2 * jnp.pi * jax.random.uniform(kt, (n,), dtype=v.dtype)
    scale = jnp.sqrt(1 - z ** 2)
    x = jnp.cos(theta) * scale
    y = jnp.sin(theta) * scale
    t1 = jnp.cross(jnp.broadcast_to(basis, v.shape), v)
    t2 = jnp.cross(t1, v)
    return x[:, None] * t1 + y[:, None] * t2 + z[:, None] * v


def perturb_vector(key, v: jax.Array, spp: int) -> jax.Array:
    """Jitter each direction spp times (source.py:521-528)."""
    P = jax.random.normal(key, (v.shape[0] * spp, v.shape[1]), dtype=v.dtype)
    P = P / jnp.linalg.norm(P, axis=-1, keepdims=True)
    vn = jnp.tile(v, (spp, 1)) + P
    return vn / jnp.linalg.norm(vn, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# planar / point / cone / area sources
# ---------------------------------------------------------------------------

def _standard_planes(v_template, angle, width, sensor_dist, xaxis, n):
    """The common sensor-plane construction used by the 3D sources."""
    dtype = v_template.dtype
    plane_v = rotate_ray3(jnp.tile(jnp.array([[0.0, 1.0, 0.0]], dtype=dtype), (n, 1)),
                          angle, vert=xaxis)
    plane_t = rotate_ray3(jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype=dtype), (n, 1)),
                          angle, vert=xaxis)
    plane_x = (sensor_dist + width / 2) * plane_v + width / 2
    return jnp.stack([plane_x, plane_v, plane_t], axis=1)


def plane_source(angle, num_rays: int, width) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """2D parallel-beam source (source.py:6-20)."""
    x = jnp.stack([jnp.linspace(-width / 2, width / 2, num_rays),
                   jnp.zeros(num_rays)], axis=1)
    v = jnp.tile(jnp.array([[0.0, 1.0]]), (num_rays, 1))
    v = rotate_ray(v, angle)
    x = rotate_ray(x, angle) + width / 2
    x = x - np.sqrt(2) * width * v / 2
    plane_v = v
    plane_x = np.sqrt(2) * width * v / 2 + width / 2
    planes = jnp.stack([plane_x, plane_v], axis=1)
    return x, v, planes


def rotate_pts_to_source(pts, angle, width, circle=False, xaxis=False,
                         sensor_dist=1.0) -> Rays:
    """Flatten grid points into a rotated parallel beam (source.py:275-293)."""
    x = jnp.stack([p.reshape(-1) for p in pts], axis=-1)
    n = x.shape[0]
    if circle:
        mask = jnp.linalg.norm(x, axis=-1) < width / 2
    else:
        mask = _full_mask(n)
    v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]], dtype=x.dtype), (n, 1))
    t = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype=x.dtype), (n, 1))

    x = rotate_ray3(x, angle, vert=xaxis) + width / 2
    v = rotate_ray3(v, angle, vert=xaxis)
    t = rotate_ray3(t, angle, vert=xaxis)
    x = x - width * v / 2

    plane_x = (sensor_dist + width / 2) * v + width / 2
    planes = jnp.stack([plane_x, v, t], axis=1)
    return Rays(x, v, planes, mask)


def plane_source3(angle, num_rays: int, width, circle=False) -> Rays:
    """Deterministic 3D parallel-beam grid (source.py:23-26)."""
    lin = jnp.linspace(-width / 2, width / 2, num_rays)
    g0, g1 = jnp.meshgrid(lin, lin, indexing="ij")
    pts = [g0, jnp.zeros((num_rays, num_rays)), g1]
    return rotate_pts_to_source(pts, angle, width, circle=circle)


def plane_source3_rand(key, angle, pixels, spp: int, width, circle=False,
                       xaxis=False, sensor_dist=1.0, independent=False) -> Rays:
    """Stratified-random planar source (source.py:54-69)."""
    ph, pw = pixels
    offset = jax.random.uniform(key, (2 * spp, ph, pw)) * width
    if independent:
        pts = [offset[:spp] - width / 2,
               jnp.zeros((spp, ph, pw)),
               offset[spp:] - width / 2]
    else:
        rng = [width * (jnp.arange(p) / p - 0.5) for p in pixels]
        g0, g1 = jnp.meshgrid(*rng, indexing="ij")
        pts = [g0[None] + offset[:spp] / ph,
               jnp.zeros((spp, ph, pw)),
               g1[None] + offset[spp:] / pw]
    return rotate_pts_to_source(pts, angle, width, circle=circle, xaxis=xaxis,
                                sensor_dist=sensor_dist)


def point_source3(angle, pixels, spp: int, width, cone_angle=90, xaxis=False,
                  sensor_dist=0.0, circle=False) -> Rays:
    """Deterministic point source with a cone fan (source.py:29-51)."""
    ang_rad = np.radians(cone_angle / 2)
    spp_side = max(int(np.floor(np.sqrt(spp))), 1)
    axes = [jnp.linspace(-ang_rad, ang_rad, p * spp_side) for p in pixels]
    theta, phi = jnp.meshgrid(*axes, indexing="ij")
    theta, phi = theta.reshape(-1), phi.reshape(-1)
    vel = jnp.stack([jnp.cos(theta) * jnp.sin(phi),
                     jnp.cos(theta) * jnp.cos(phi),
                     jnp.sin(theta)], axis=-1)
    n = vel.shape[0]
    pos = jnp.tile(jnp.array([[0.0, -width / 2, 0.0]]), (n, 1))
    vel = vel / jnp.linalg.norm(vel, axis=-1, keepdims=True)

    x = rotate_ray3(pos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)
    planes = _standard_planes(v, angle, width, sensor_dist, xaxis, n)
    return Rays(x, v, planes, _full_mask(n))


def point_source3_rand(key, angle, pixels, spp: int, width, circle=False,
                       xaxis=False, sensor_dist=1.0) -> Rays:
    """Random point source fanning to the stratified sensor grid
    (source.py:72-104).  The plane origin is ``sensor_dist*width/2`` out."""
    ph, pw = pixels
    offset = jax.random.uniform(key, (2 * spp, ph, pw)) - 0.5
    rng = [width * ((jnp.arange(p) + 0.5) / p - 0.5) for p in pixels]
    g0, g1 = jnp.meshgrid(*rng, indexing="ij")
    p0 = g0[None] + offset[:spp]
    p1 = g1[None] + offset[spp:]

    vels = jnp.stack([p0.reshape(-1), width * jnp.ones(ph * pw * spp), p1.reshape(-1)],
                     axis=-1)
    vel = vels / jnp.linalg.norm(vels, axis=-1, keepdims=True)
    n = vel.shape[0]
    if circle:
        mask = jnp.linalg.norm(jnp.stack([p0.reshape(-1), p1.reshape(-1)]), axis=0) < width / 2
    else:
        mask = _full_mask(n)

    pos = jnp.tile(jnp.array([[0.0, -width / 2, 0.0]]), (n, 1))
    x = rotate_ray3(pos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)

    dtype = v.dtype
    plane_v = rotate_ray3(jnp.tile(jnp.array([[0.0, 1.0, 0.0]], dtype=dtype), (n, 1)),
                          angle, vert=xaxis)
    plane_t = rotate_ray3(jnp.tile(jnp.array([[0.0, 0.0, 1.0]], dtype=dtype), (n, 1)),
                          angle, vert=xaxis)
    plane_x = sensor_dist * width * plane_v / 2 + width / 2  # source.py:102
    planes = jnp.stack([plane_x, plane_v, plane_t], axis=1)
    return Rays(x, v, planes, mask)


def area_source3_rand_bias(key, angle, pixels, spp: int, width, circle=False,
                           xaxis=False, sensor_dist=1.0):
    """Area source biased to hit the sensor (source.py:107-150).

    Returns (Rays, xt, tpv): per-ray backprojected target points and the
    plane-hit parameter.
    """
    ph, pw = pixels
    k1, k2 = jax.random.split(key)
    offset = (jax.random.uniform(k1, (2 * spp, ph, pw)) - 0.5) * (width / ph)
    rng = [width * ((jnp.arange(p) + 0.5) / p - 0.5) for p in pixels]
    g0, g1 = jnp.meshgrid(*rng, indexing="ij")
    pts = [g0[None] + offset[:spp],
           jnp.zeros((spp, ph, pw)),
           g1[None] + offset[spp:]]
    pos = jnp.stack([p.reshape(-1) for p in pts], axis=-1)
    n = pos.shape[0]
    mask = (jnp.linalg.norm(pos, axis=-1) < width / 2) if circle else _full_mask(n)

    pt = -pos
    ydir = jnp.array([[0.0, 1.0, 0.0]])
    pos = pos - (sensor_dist + width / 2) * ydir
    pt = pt + (sensor_dist + width / 2) * ydir

    tosense = (jax.random.uniform(k2, (2, n)) - 0.5) * width
    target = jnp.stack([tosense[0], width * jnp.ones(n) / 2, tosense[1]], axis=-1)

    vel = target - pos
    vel = vel / jnp.linalg.norm(vel, axis=-1, keepdims=True)
    tpv = sensor_dist / vel[:, 1]
    npos = pos + tpv[:, None] * vel

    xt = rotate_ray3(pt, angle, vert=xaxis) + width / 2
    x = rotate_ray3(npos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)
    planes = _standard_planes(v, angle, width, sensor_dist, xaxis, n)
    return Rays(x, v, planes, mask), xt, tpv


def area_source3_cone(key, angle, pixels, spp: int, width, circle=False,
                      xaxis=False, sensor_dist=1.0, cone_angle=90):
    """Area source emitting into a cone (source.py:153-183).
    Returns (Rays, tpv)."""
    ph, pw = pixels
    k1, k2 = jax.random.split(key)
    offset = (jax.random.uniform(k1, (2 * spp, ph, pw)) - 0.5) * (width / ph)
    rng = [width * ((jnp.arange(p) + 0.5) / p - 0.5) for p in pixels]
    g0, g1 = jnp.meshgrid(*rng, indexing="ij")
    pts = [g0[None] + offset[:spp],
           -width * jnp.ones((spp, ph, pw)) / 2,
           g1[None] + offset[spp:]]
    pos = jnp.stack([p.reshape(-1) for p in pts], axis=-1)
    n = pos.shape[0]
    mask = (jnp.linalg.norm(pos, axis=-1) < width / 2) if circle else _full_mask(n)

    forward = jnp.zeros_like(pos).at[:, 1].set(1.0)
    vel = hatbox_sample(k2, forward, cone_angle)
    tpv = sensor_dist / vel[:, 1]

    x = rotate_ray3(pos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)
    planes = _standard_planes(v, angle, width, sensor_dist, xaxis, n)
    return Rays(x, v, planes, mask), tpv


def cone_source3_rand(key, angle, pixels, spp: int, width, circle=False,
                      xaxis=False, sensor_dist=1.0, cone_angle=100.0) -> Rays:
    """Point source with random cone directions (source.py:186-202)."""
    n = pixels[0] * pixels[1] * spp
    pos = jnp.tile(jnp.array([[0.0, -width / 2, 0.0]]), (n, 1))
    vel = jnp.zeros_like(pos).at[:, 1].set(1.0)
    vel = hatbox_sample(key, vel, cone_angle)

    x = rotate_ray3(pos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)
    planes = _standard_planes(v, angle, width, sensor_dist, xaxis, n)
    return Rays(x, v, planes, _full_mask(n))


def area_source3_rand(key, angle, pixels, spp: int, width, circle=False,
                      xaxis=False, sensor_dist=1.0):
    """Hemispherical area source with hit-the-volume rejection
    (source.py:205-272).  Rejected rays are masked out, not dropped.
    Returns (Rays, xt, tpv)."""
    ph, pw = pixels
    k1, k2 = jax.random.split(key)
    offset = (jax.random.uniform(k1, (2 * spp, ph, pw)) - 0.5) * (width / ph)
    hemi = jax.random.normal(k2, (spp * ph * pw, 3))

    rng = [width * ((jnp.arange(p) + 0.5) / p - 0.5) for p in pixels]
    g0, g1 = jnp.meshgrid(*rng, indexing="ij")
    pts = [g0[None] + offset[:spp],
           jnp.zeros((spp, ph, pw)),
           g1[None] + offset[spp:]]
    pos = jnp.stack([p.reshape(-1) for p in pts], axis=-1)
    n = pos.shape[0]

    vel = hemi / jnp.linalg.norm(hemi, axis=-1, keepdims=True)
    vel = vel.at[:, 1].set(jnp.abs(vel[:, 1]))

    mask = (jnp.linalg.norm(pos, axis=-1) < width / 2) if circle else _full_mask(n)

    pt = -pos
    ydir = jnp.array([[0.0, 1.0, 0.0]])
    pos = pos - (sensor_dist + width / 2) * ydir
    pt = pt + (sensor_dist + width / 2) * ydir

    tpv = sensor_dist / vel[:, 1]
    npos = pos + tpv[:, None] * vel
    hitvol = jnp.all(jnp.abs(npos) <= width / 2, axis=-1)
    mask = mask & hitvol

    xt = rotate_ray3(pt, angle, vert=xaxis) + width / 2
    x = rotate_ray3(pos, angle, vert=xaxis) + width / 2
    v = rotate_ray3(vel, angle, vert=xaxis)
    planes = _standard_planes(v, angle, width, sensor_dist, xaxis, n)
    return Rays(x, v, planes, mask), xt, tpv


def sample_sphere(key, nrays: int, width, cone_angle=90.0, lens_type="luneburg"):
    """Sphere-surface source for lens tests (source.py:315-334).

    Deviation from the reference: directions are re-normalized.  The
    reference's hatbox tangent frame is unnormalized cross products
    (source.py:542-543), which for arbitrary cone axes yields |v| < 1 and
    breaks the tracer's |v| = n speed convention — a latent bug there (the
    function is unused by its drivers)."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (nrays, 3))
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    v = -xn
    vn = hatbox_sample(k2, v, cone_angle)
    vn = vn / jnp.linalg.norm(vn, axis=1, keepdims=True)
    xn = xn * width / 2

    tangent = jax.random.normal(k3, (nrays, 3))
    plane_t = tangent / jnp.linalg.norm(tangent, axis=1, keepdims=True)

    if lens_type == "luneburg":
        plane_x = width / 2 + vn * (width / 2)
    else:
        plane_x = -xn + width / 2
    planes = jnp.stack([plane_x, v, plane_t], axis=1)
    rpv = [nrays]
    return Rays(xn + width / 2, vn, planes, _full_mask(nrays)), rpv


# ---------------------------------------------------------------------------
# multi-view rigs
# ---------------------------------------------------------------------------

def _cat_rays(views: Sequence[Rays]):
    x = jnp.concatenate([r.x for r in views])
    v = jnp.concatenate([r.v for r in views])
    p = jnp.concatenate([r.planes for r in views])
    m = jnp.concatenate([r.mask for r in views])
    nrays = [r.x.shape[0] for r in views]
    return Rays(x, v, p, m), nrays


def rays_in_circle(nviews, rays_per_view, width, angle_span=360):
    """2D ring of parallel-beam views (source.py:337-342)."""
    angles = np.linspace(0, angle_span, nviews + 1)
    views = [plane_source(angles[i], rays_per_view, width) for i in range(nviews)]
    return tuple(map(jnp.concatenate, zip(*views)))


def rays_in_sphere(nviews, rays_per_view, width, angle_span=360, circle=False):
    angles = np.linspace(0, angle_span, nviews + 1)
    views = [plane_source3(angles[i], rays_per_view, width, circle=circle)
             for i in range(nviews)]
    return _cat_rays(views)


def rand_rays_in_sphere(key, nviews, im_res, spp, width, angle_span=360,
                        circle=False, xaxis=False, sensor_dist=1.0, indep=False):
    angles = np.linspace(0, angle_span, nviews + 1)
    keys = jax.random.split(key, nviews)
    views = [plane_source3_rand(keys[i], angles[i], im_res, spp, width,
                                circle=circle, xaxis=xaxis,
                                sensor_dist=sensor_dist, independent=indep)
             for i in range(nviews)]
    return _cat_rays(views)


def rand_ptrays_in_sphere(key, nviews, im_res, spp, width, angle_span=360,
                          circle=False, xaxis=False, sensor_dist=0.0):
    angles = np.linspace(0, angle_span, nviews + 1)
    keys = jax.random.split(key, nviews)
    views = [point_source3_rand(keys[i], angles[i], im_res, spp, width,
                                circle=circle, xaxis=xaxis, sensor_dist=sensor_dist)
             for i in range(nviews)]
    return _cat_rays(views)


def rand_area_in_sphere(key, nviews, im_res, spp, width, angle_span=360,
                        circle=False, xaxis=False, sensor_dist=1.0):
    angles = np.linspace(0, angle_span, nviews + 1)
    keys = jax.random.split(key, nviews)
    out = [area_source3_rand_bias(keys[i], angles[i], im_res, spp, width,
                                  circle=circle, xaxis=xaxis, sensor_dist=sensor_dist)
           for i in range(nviews)]
    views, targets, dists = zip(*out)
    rays, nrays = _cat_rays(views)
    return rays, jnp.concatenate(targets), jnp.concatenate(dists), nrays


def rand_cone_in_sphere(key, nviews, im_res, spp, width, angle_span=360,
                        circle=False, xaxis=False, sensor_dist=1.0, cone_angle=90.0):
    angles = np.linspace(0, angle_span, nviews + 1)
    keys = jax.random.split(key, nviews)
    out = [area_source3_cone(keys[i], angles[i], im_res, spp, width,
                             circle=circle, xaxis=xaxis, sensor_dist=sensor_dist,
                             cone_angle=cone_angle)
           for i in range(nviews)]
    views, dists = zip(*out)
    rays, nrays = _cat_rays(views)
    return rays, jnp.concatenate(dists), nrays


def rand_ptcone_in_sphere(key, nviews, im_res, spp, width, angle_span=360,
                          circle=False, xaxis=False, sensor_dist=1.0, cone_angle=90.0):
    angles = np.linspace(0, angle_span, nviews + 1)
    keys = jax.random.split(key, nviews)
    views = [cone_source3_rand(keys[i], angles[i], im_res, spp, width,
                               circle=circle, xaxis=xaxis, sensor_dist=sensor_dist,
                               cone_angle=cone_angle)
             for i in range(nviews)]
    rays, nrays = _cat_rays(views)
    dists = jnp.zeros(nviews)
    return rays, dists, nrays


def rand_rays_cube(key, im_res, spp, width, circle=False, src_type="plane",
                   cone_ang=90):
    """6-face cube coverage: 4 side angles + 2 vertical (source.py:398-412)."""
    angles = np.linspace(0, 360, 5)[:-1]
    vangles = [90.0, -90.0]
    keys = jax.random.split(key, 6)
    views = []
    for i, a in enumerate(angles):
        views.append(_cube_view(keys[i], a, im_res, spp, width, circle,
                                src_type, cone_ang, xaxis=False))
    for j, a in enumerate(vangles):
        views.append(_cube_view(keys[4 + j], a, im_res, spp, width, circle,
                                src_type, cone_ang, xaxis=True))
    return _cat_rays(views)


def _cube_view(key, angle, im_res, spp, width, circle, src_type, cone_ang, xaxis):
    if src_type == "plane":
        return plane_source3_rand(key, angle, im_res, spp, width, circle=circle,
                                  xaxis=xaxis, sensor_dist=0.0)
    elif src_type == "point":
        return point_source3(angle, im_res, spp, width, cone_angle=cone_ang,
                             xaxis=xaxis, sensor_dist=0.0, circle=circle)
    else:
        return cone_source3_rand(key, angle, im_res, spp, width, circle=circle,
                                 xaxis=xaxis, sensor_dist=0.0, cone_angle=cone_ang)


# ---------------------------------------------------------------------------
# image norms & 1D sensors
# ---------------------------------------------------------------------------

def sum_norm(im, scale=False):
    """Normalize the mean to 1 (source.py:415-420)."""
    npix = im.size
    scalar = npix / im.sum()
    return (scalar * im, scalar) if scale else scalar * im


def sum_norm2(im, scale=False):
    npix = im.size
    scalar = npix / jnp.linalg.norm(im.reshape(-1))
    return (scalar * im, scalar) if scale else scalar * im


def norm_image(im):
    rng = im.max() - im.min()
    return jnp.where(jnp.isclose(rng, 0.0), im, (im - im.min()) / rng)


def tent_filter(x, r=1):
    inv_dist = r - x
    dx = jnp.where(inv_dist < 0, 0.0, -jnp.ones_like(x))
    return jnp.clip(inv_dist, min=0), dx


def gauss_filter(x, r=1.0, a=0.5):
    v = jnp.exp(-a * x ** 2) - np.exp(-a * r ** 2)
    vx = -2 * a * x * jnp.exp(-a * x ** 2) - np.exp(-a * r ** 2)
    mask = jnp.abs(x) > 1
    return jnp.where(mask, 0.0, v), jnp.where(mask, 0.0, vx)


def create_sensor(x, v, plane, nbins: int, span, e=1.0):
    """1D tent-filtered intensity histogram with analytic dI/dx
    (source.py:458-501).  2D rays; ``plane`` is (2, 2) [origin, normal]."""
    p, n = plane[None, 0], plane[None, 1]
    t = rotate_ray(plane[None, 1], 90)
    h = span / nbins

    dp = jnp.einsum("nd,nd->n", x - p, jnp.broadcast_to(t, x.shape))
    dpn = nbins * (0.5 + dp / span) - 0.5

    vals = jnp.abs(e * jnp.ones_like(dpn))

    dpl = jnp.floor(dpn).astype(jnp.int32)
    dph = dpl + 1
    lm = (dpl < nbins) & (dpl >= 0)
    hm = (dph < nbins) & (dph >= 0)

    wl, wlx = tent_filter(dpn - dpl)
    wh, whx = tent_filter(dpn - dph)
    ws = wl + wh

    sensor = jnp.zeros(nbins, dtype=vals.dtype)
    sensor = sensor.at[jnp.clip(dpl, 0, nbins - 1)].add(
        jnp.where(lm, wl * vals / ws, 0.0))
    sensor = sensor.at[jnp.clip(dph, 0, nbins - 1)].add(
        jnp.where(hm, wh * vals / ws, 0.0))

    sv = jnp.where(lm[:, None], wl[:, None] * n, 0.0)
    sv = sv + jnp.where(hm[:, None], wh[:, None] * n, 0.0)
    sx = jnp.where(lm[:, None], (wlx * vals)[:, None] * t / h, 0.0)
    sx = sx + jnp.where(hm[:, None], (whx * vals)[:, None] * t / h, 0.0)

    return sensor, (sx, sv, jnp.clip(dpl, 0, nbins - 1), jnp.clip(dph, 0, nbins - 1))


def render_intensities(x, v, planes, nviews, nrays, nbins, dim, grad=False):
    """Per-view 1D intensity renders (source.py:504-518)."""
    out = [create_sensor(x[i * nrays:(i + 1) * nrays],
                         v[i * nrays:(i + 1) * nrays],
                         planes[i * nrays], nbins, dim, e=1.0 / nrays)
           for i in range(nviews)]
    ims = jnp.concatenate([o[0] for o in out])
    if grad:
        dxs = [jnp.concatenate(parts) for parts in zip(*[o[1] for o in out])]
        return ims, dxs
    return ims

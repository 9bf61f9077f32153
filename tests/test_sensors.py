"""Sensor + source tests: plane propagation, splatting, mask semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu import sensors
from adjointnonlinearraytracing_tpu.sources import sources as S
from adjointnonlinearraytracing_tpu.fields import rbf


class TestPlane:
    def test_trace_rays_to_plane(self):
        x = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        v = jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
        p = jnp.array([[0.0, 2.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        xp, vp = sensors.trace_rays_to_plane((x, v), (p, n))
        np.testing.assert_allclose(xp[:, 1], 2.0, atol=1e-12)
        np.testing.assert_allclose(xp[1], [1.0, 2.0, 2.0], atol=1e-12)

    def test_differentiable(self):
        x = jnp.array([[0.0, 0.0, 0.5]])
        v = jnp.array([[0.1, 1.0, 0.0]])
        p = jnp.array([[0.0, 3.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])

        def f(v):
            xp, _ = sensors.trace_rays_to_plane((x, v), (p, n))
            return xp[0, 0]

        g = jax.grad(f)(v)
        assert jnp.isfinite(g).all()
        assert abs(g[0, 0] - 3.0) < 1e-6  # dxp_x/dv_x = t = 3

    def test_tan_vecs(self):
        n = jnp.array([[0.0, 1.0, 0.0]])
        t1, t2 = sensors.get_tan_vecs(n)
        np.testing.assert_allclose(t2, [[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(t1, [[1.0, 0.0, 0.0]])


class TestGenerateSensor:
    def _rays(self, n=512, seed=0):
        key = jax.random.PRNGKey(seed)
        x = jnp.stack([
            jax.random.uniform(key, (n,), minval=2.0, maxval=8.0),
            jnp.zeros(n),
            jax.random.uniform(jax.random.PRNGKey(seed + 1), (n,), minval=2.0, maxval=8.0),
        ], axis=-1)
        v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        return x, v

    def test_energy_conservation(self):
        """All emission lands on the sensor (normalized tent weights)."""
        x, v = self._rays()
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        im = sensors.generate_sensor((x, v), 1.0, (p, n), 32, 20.0)
        np.testing.assert_allclose(im.sum(), x.shape[0], rtol=1e-6)

    def test_mask_drops_rays(self):
        x, v = self._rays(64)
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        mask = jnp.arange(64) < 32
        im = sensors.generate_sensor((x, v), 1.0, (p, n), 16, 20.0, mask=mask)
        np.testing.assert_allclose(im.sum(), 32, rtol=1e-6)

    def test_foreshortening(self):
        x = jnp.array([[5.0, 0.0, 5.0]])
        v45 = jnp.array([[0.0, 1.0, 1.0]]) / np.sqrt(2)
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        im = sensors.generate_sensor((x, v45), 1.0, (p, n), 16, 40.0)
        np.testing.assert_allclose(im.sum(), 1 / np.sqrt(2), rtol=1e-6)

    def test_inf_sensor_runs(self):
        x, v = self._rays(128)
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        im = sensors.generate_inf_sensor((x, v), 1.0, (p, n), 16)
        np.testing.assert_allclose(im.sum(), 128, rtol=1e-6)

    def test_pleno_sensor_runs(self):
        x, v = self._rays(64)
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        pleno = sensors.generate_pleno_sensor((x, v), 1.0, (p, n),
                                              (8, 8, 4, 4), 20.0)
        assert pleno.shape == (8, 8, 4, 4)
        # reference diagonal corner pairing deposits sum_c wxe_c*wve_c <= 1
        # per ray (sensor.py:84-98), so the total is below the ray count
        total = float(pleno.sum())
        assert 0.0 < total <= 64.0
        # normal-incidence rays concentrate in the central direction bins
        dir_marginal = pleno.sum(axis=(0, 1))
        assert float(dir_marginal[1:3, 1:3].sum()) > 0.5 * total

    def test_splat_differentiable(self):
        x, v = self._rays(32)
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])

        def f(x):
            im = sensors.generate_sensor((x, v), 1.0, (p, n), 16, 20.0)
            return jnp.sum(im ** 2)

        g = jax.grad(f)(x)
        assert jnp.isfinite(g).all()
        assert jnp.abs(g).max() > 0


class TestSources:
    def test_plane_source3_rand_shapes(self):
        key = jax.random.PRNGKey(0)
        r = S.plane_source3_rand(key, 0.0, (8, 8), 2, 10.0)
        assert r.x.shape == (128, 3)
        assert r.planes.shape == (128, 3, 3)
        assert bool(r.mask.all())
        # rays start on the entry face (y=0) moving toward the volume
        np.testing.assert_allclose(r.x[:, 1], 0.0, atol=1e-9)
        np.testing.assert_allclose(r.v, jnp.tile(jnp.array([[0, 1.0, 0]]), (128, 1)),
                                   atol=1e-12)

    def test_circle_masks(self):
        key = jax.random.PRNGKey(1)
        r = S.plane_source3_rand(key, 0.0, (16, 16), 1, 10.0, circle=True)
        assert r.x.shape[0] == 256
        assert 0 < int(r.mask.sum()) < 256
        # masked fraction approximates circle area pi/4
        frac = float(r.mask.mean())
        assert abs(frac - np.pi / 4) < 0.12

    def test_rotation_preserves_geometry(self):
        key = jax.random.PRNGKey(2)
        r0 = S.plane_source3_rand(key, 0.0, (4, 4), 1, 10.0)
        r90 = S.plane_source3_rand(key, 90.0, (4, 4), 1, 10.0)
        np.testing.assert_allclose(jnp.linalg.norm(r90.v, axis=-1), 1.0, atol=1e-12)
        # 90 degrees about z maps +y to -x
        np.testing.assert_allclose(r90.v, jnp.tile(jnp.array([[-1.0, 0, 0]]), (16, 1)),
                                   atol=1e-9)

    def test_point_source_norm(self):
        r = S.point_source3(0.0, (4, 4), 4, 10.0)
        np.testing.assert_allclose(jnp.linalg.norm(r.v, axis=-1), 1.0, atol=1e-12)

    def test_hatbox_cone_angle(self):
        key = jax.random.PRNGKey(3)
        v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (512, 1))
        out = S.hatbox_sample(key, v, 60.0)
        cosang = jnp.einsum("nd,nd->n", out, v)
        assert float(cosang.min()) > np.cos(np.radians(30.0)) - 1e-6
        np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 1.0, atol=1e-6)

    def test_random_rotmat_orthonormal(self):
        R = S.random_rotmat(jax.random.PRNGKey(4))
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_rand_rays_cube_counts(self):
        key = jax.random.PRNGKey(5)
        rays, nrays = S.rand_rays_cube(key, (4, 4), 1, 10.0)
        assert len(nrays) == 6
        assert rays.x.shape[0] == sum(nrays) == 96

    def test_area_source_bias_hits_sensor(self):
        key = jax.random.PRNGKey(6)
        rays, xt, tpv = S.area_source3_rand_bias(key, 0.0, (4, 4), 2, 10.0)
        assert rays.x.shape == (32, 3)
        assert xt.shape == (32, 3)
        assert jnp.all(tpv > 0)

    def test_sum_norm(self):
        im = jnp.array([[1.0, 2.0], [3.0, 4.0]])
        out = S.sum_norm(im)
        np.testing.assert_allclose(out.mean(), 1.0, atol=1e-12)

    def test_create_sensor_1d(self):
        x = jnp.array([[0.0, 5.0], [1.0, 5.0]])
        v = jnp.array([[0.0, 1.0], [0.0, 1.0]])
        plane = jnp.array([[0.0, 5.0], [0.0, 1.0]])
        sensor, grads = S.create_sensor(x, v, plane, 8, 8.0)
        np.testing.assert_allclose(sensor.sum(), 2.0, rtol=1e-6)

    def test_random_rotate_ic_consistency(self):
        key = jax.random.PRNGKey(7)
        r = S.plane_source3_rand(key, 0.0, (4, 4), 1, 10.0)
        xn, vn, pl = S.random_rotate_ic(jax.random.PRNGKey(8), r.x, r.v,
                                        r.planes, 10.0)
        np.testing.assert_allclose(jnp.linalg.norm(vn, axis=-1), 1.0, atol=1e-12)
        # distances from center preserved
        d0 = jnp.linalg.norm(r.x - 5.0, axis=-1)
        d1 = jnp.linalg.norm(xn - 5.0, axis=-1)
        np.testing.assert_allclose(d0, d1, atol=1e-9)


class TestTextureLosses:
    def test_sdf_vals_near(self):
        d_tex = jnp.zeros((16, 16)).at[8, 8].set(1.0)
        x = jnp.array([[5.0, 0.0, 5.0]])
        v = jnp.array([[0.0, 1.0, 0.0]])
        p = jnp.array([[5.0, 10.0, 5.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        val = sensors.get_sdf_vals_near((x, v), d_tex, (p, n), 10.0)
        assert val.shape == (1,)
        assert jnp.isfinite(val).all()

    def test_refract_straight(self):
        x = jnp.array([[0.0, 0.0, 0.0]])
        v = jnp.array([[0.0, 1.0, 0.0]])
        p = jnp.array([[0.0, 1.0, 0.0]])
        n = jnp.array([[0.0, 1.0, 0.0]])
        _, vout = sensors.refract((x, v), (p, n), etai=1.0)
        np.testing.assert_allclose(vout, v, atol=1e-12)


class TestCompat:
    """Reference-style class wrappers behave like the functional core."""

    def test_grid_wrapper(self):
        from adjointnonlinearraytracing_tpu.compat import Grid

        g = Grid(jnp.zeros((16, 16)), 0.5)
        x = jnp.array([[3.2, 4.1], [1.5, 2.5]])
        g.Splat(x, jnp.ones(2), average=False)
        np.testing.assert_allclose(g.scene.sum(), 2.0, rtol=1e-6)
        f, fx = g.GetLinear(x)
        assert f.shape == (2,)

    def test_cable_wrapper(self):
        from adjointnonlinearraytracing_tpu.compat import Cable

        c = Cable(jnp.linspace(1.5, 1.0, 9), 1.0, 4.0)
        x = jnp.array([[1.0, 2.0, 1.3]])
        f, fx = c.GetLinear(x)
        assert float(f[0]) > 1.0
        assert c.render2(8).shape == (8, 8)

    def test_tracer_aliases(self):
        from adjointnonlinearraytracing_tpu import compat

        rif = jnp.ones((5, 5, 5))
        x = jnp.array([[2.0, -0.5, 2.0]])
        v = jnp.array([[0.0, 1.0, 0.0]])
        xt1, vt1 = compat.BackTracerC(rif, x, v, 1.0, 0.5)
        xt2, vt2 = compat.ADTracerC(rif, x, v, 1.0, 0.5)
        np.testing.assert_allclose(xt1, xt2, atol=1e-12)


class TestMoreSources:
    def test_rays_in_sphere(self):
        rays, nrays = S.rays_in_sphere(4, 6, 10.0)
        assert rays.x.shape[0] == sum(nrays) == 4 * 36

    def test_rand_wrappers(self):
        key = jax.random.PRNGKey(0)
        r1, n1 = S.rand_rays_in_sphere(key, 3, (4, 4), 1, 10.0)
        assert r1.x.shape[0] == 48 and len(n1) == 3
        r2, n2 = S.rand_ptrays_in_sphere(key, 2, (4, 4), 1, 10.0)
        assert r2.x.shape[0] == 32
        r3, tgt, tpv, n3 = S.rand_area_in_sphere(key, 2, (4, 4), 1, 10.0)
        assert r3.x.shape[0] == tgt.shape[0] == tpv.shape[0] == 32
        r4, d4, n4 = S.rand_cone_in_sphere(key, 2, (4, 4), 1, 10.0)
        assert r4.x.shape[0] == 32
        r5, d5, n5 = S.rand_ptcone_in_sphere(key, 2, (4, 4), 1, 10.0)
        assert r5.x.shape[0] == 32

    def test_sample_sphere(self):
        rays, rpv = S.sample_sphere(jax.random.PRNGKey(1), 64, 10.0)
        # origins on the sphere of radius width/2 around center
        r = jnp.linalg.norm(rays.x - 5.0, axis=-1)
        np.testing.assert_allclose(r, 5.0, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(rays.v, axis=-1), 1.0,
                                   atol=1e-6)

    def test_perturb_vector(self):
        v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (8, 1))
        out = S.perturb_vector(jax.random.PRNGKey(2), v, 3)
        assert out.shape == (24, 3)
        np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1), 1.0,
                                   atol=1e-6)

    def test_norms_and_filters(self):
        im = jnp.array([[1.0, 3.0], [2.0, 6.0]])
        np.testing.assert_allclose(float(jnp.linalg.norm(
            S.sum_norm2(im).ravel())), 4.0, rtol=1e-6)
        out = S.norm_image(im)
        assert float(out.min()) == 0.0 and float(out.max()) == 1.0
        flat = S.norm_image(jnp.ones((3, 3)))
        np.testing.assert_allclose(flat, 1.0)
        v, vx = S.gauss_filter(jnp.array([0.0, 0.5, 2.0]))
        assert v[2] == 0.0 and jnp.isfinite(v).all()

    def test_rotate_ic(self):
        r = S.plane_source3(0.0, 4, 10.0)
        xr, vr, pl = S.rotate_ic(r.x, r.v, r.planes, 90.0, 10.0)
        np.testing.assert_allclose(jnp.linalg.norm(vr, axis=-1), 1.0,
                                   atol=1e-9)
        assert pl.shape == r.planes.shape

    def test_render_intensities(self):
        x, v, planes = S.rays_in_circle(2, 16, 8.0)
        ims = S.render_intensities(x, v, planes, 2, 16, 8, 8.0)
        assert ims.shape == (16,)
        ims2, grads = S.render_intensities(x, v, planes, 2, 16, 8, 8.0,
                                           grad=True)
        assert len(grads) == 4

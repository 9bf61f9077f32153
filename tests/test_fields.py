"""Unit tests for the voxel and cylinder fields.

The key identities (the reference had no tests; SURVEY.md §4 calls for these):
* eval_grad's gradient == autodiff gradient of the interpolated value,
* splat is the exact transpose of eval_grad (dot-product identity),
* eval_hess == autodiff Jacobian of eval_grad's gradient (off-diagonals),
* inbounds/escaped truth tables match the reference semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjointnonlinearraytracing_tpu.fields import (
    GridField, eval_grad, eval_hess, hess_matvec, splat_delta, inbounds,
    escaped, upres_volume,
    CylinderField, cyl_eval_grad, cyl_eval_hess, cyl_hess_matvec,
    cyl_splat_delta, cyl_inbounds, cyl_escaped, upres_profile_midpoint,
)


def make_field(key, res=5, h=0.7):
    data = 1.0 + jax.random.uniform(key, (res, res, res))
    return GridField(data, h)


def interior_points(key, field, n=64):
    d, hh, w = field.data.shape
    lo = 0.51 * field.h
    hi = (min(d, hh, w) - 1) * field.h - 0.51 * field.h
    return jax.random.uniform(key, (n, 3), minval=lo, maxval=hi)


class TestEvalGrad:
    def test_constant_field(self):
        f = GridField(2.5 * jnp.ones((4, 4, 4)), 1.0)
        p = jnp.array([[1.2, 1.7, 0.4], [0.0, 0.0, 0.0]])
        n, nx = eval_grad(f, p)
        np.testing.assert_allclose(n, 2.5, rtol=1e-6)
        np.testing.assert_allclose(nx, 0.0, atol=1e-6)

    def test_linear_field_exact(self):
        # f(x,y,z) = a + bx*x + by*y + bz*z is reproduced exactly by trilinear
        h = 0.5
        res = 6
        idx = jnp.arange(res, dtype=jnp.float32) * h
        z, y, x = jnp.meshgrid(idx, idx, idx, indexing="ij")
        bx, by, bz = 0.3, -0.2, 0.7
        data = 1.0 + bx * x + by * y + bz * z
        f = GridField(data, h)
        key = jax.random.PRNGKey(0)
        p = interior_points(key, f, 32)
        n, nx = eval_grad(f, p)
        expect = 1.0 + bx * p[:, 0] + by * p[:, 1] + bz * p[:, 2]
        np.testing.assert_allclose(n, expect, rtol=1e-5)
        np.testing.assert_allclose(
            nx, jnp.tile(jnp.array([[bx, by, bz]]), (p.shape[0], 1)), rtol=1e-4, atol=1e-5)

    def test_grad_matches_autodiff(self):
        key = jax.random.PRNGKey(1)
        f = make_field(key)
        p = interior_points(jax.random.PRNGKey(2), f, 16)

        def value(pt):
            n, _ = eval_grad(f, pt[None, :])
            return n[0]

        _, nx = eval_grad(f, p)
        for i in range(p.shape[0]):
            gi = jax.grad(value)(p[i])
            np.testing.assert_allclose(nx[i], gi, rtol=1e-4, atol=1e-5)

    def test_mask_zeroes(self):
        key = jax.random.PRNGKey(3)
        f = make_field(key)
        p = interior_points(jax.random.PRNGKey(4), f, 8)
        mask = jnp.array([True, False] * 4)
        n, nx = eval_grad(f, p, mask)
        assert jnp.all(n[1::2] == 0)
        assert jnp.all(nx[1::2] == 0)
        n2, _ = eval_grad(f, p)
        np.testing.assert_allclose(n[::2], n2[::2])

    def test_border_clamp(self):
        # points outside gather clamped border values (volume.cpp:131-132)
        f = GridField(jnp.arange(27.0).reshape(3, 3, 3), 1.0)
        p = jnp.array([[-0.4, 0.5, 0.5]])
        n, _ = eval_grad(f, p)
        assert jnp.isfinite(n).all()


class TestSplatTranspose:
    def test_dot_product_identity(self):
        """<splat(p,val,g), u> == sum val*n_u(p) + g . grad_u(p) for any u."""
        key = jax.random.PRNGKey(5)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        f = make_field(k1)
        p = interior_points(k2, f, 32)
        val = jax.random.normal(k3, (32,))
        g = jax.random.normal(k4, (32, 3))
        u = jax.random.normal(k5, f.data.shape)

        delta = splat_delta(f, p, val, g)
        lhs = jnp.vdot(delta, u.reshape(-1))

        uf = GridField(u, f.h)
        n_u, grad_u = eval_grad(uf, p)
        rhs = jnp.sum(val * n_u) + jnp.sum(g * grad_u)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_vjp_equivalence(self):
        """splat_delta == vjp of (val, grad) -> (n, nx) wrt the data."""
        key = jax.random.PRNGKey(6)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        f = make_field(k1, res=4)
        p = interior_points(k2, f, 8)
        val = jax.random.normal(k3, (8,))
        g = jax.random.normal(k4, (8, 3))

        def both(data):
            return eval_grad(GridField(data, f.h), p)

        _, vjp = jax.vjp(both, f.data)
        (ddata,) = vjp((val, g))
        delta = splat_delta(f, p, val, g)
        np.testing.assert_allclose(delta.reshape(f.data.shape), ddata,
                                   rtol=1e-4, atol=1e-5)

    def test_masked_splat(self):
        key = jax.random.PRNGKey(7)
        f = make_field(key)
        p = interior_points(jax.random.PRNGKey(8), f, 8)
        val = jnp.ones(8)
        g = jnp.ones((8, 3))
        mask = jnp.zeros(8, dtype=bool)
        delta = splat_delta(f, p, val, g, mask)
        assert jnp.all(delta == 0)


class TestHessian:
    def test_matches_autodiff_offdiag(self):
        key = jax.random.PRNGKey(9)
        f = make_field(key)
        p = interior_points(jax.random.PRNGKey(10), f, 8)

        def gradfn(pt):
            _, nx = eval_grad(f, pt[None, :])
            return nx[0]

        dxdy, dxdz, dydz = eval_hess(f, p)
        for i in range(p.shape[0]):
            H = jax.jacfwd(gradfn)(p[i])
            np.testing.assert_allclose(dxdy[i], H[0, 1], rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(dxdz[i], H[0, 2], rtol=1e-3, atol=1e-5)
            np.testing.assert_allclose(dydz[i], H[1, 2], rtol=1e-3, atol=1e-5)

    def test_matvec(self):
        hess = (jnp.array([1.0]), jnp.array([2.0]), jnp.array([3.0]))
        mu = jnp.array([[1.0, 1.0, 1.0]])
        out = hess_matvec(hess, mu)
        np.testing.assert_allclose(out, [[3.0, 4.0, 5.0]])


class TestBounds:
    def test_inbounds(self):
        f = GridField(jnp.ones((5, 5, 5)), 2.0)  # extent [0, 8)
        p = jnp.array([[0.0, 0.0, 0.0], [7.99, 7.99, 7.99],
                       [8.0, 4.0, 4.0], [-0.01, 4.0, 4.0]])
        np.testing.assert_array_equal(inbounds(f, p), [True, True, False, False])

    def test_escaped_direction(self):
        f = GridField(jnp.ones((5, 5, 5)), 2.0)
        p = jnp.array([[-1.0, 4.0, 4.0], [-1.0, 4.0, 4.0], [9.0, 4.0, 4.0]])
        v = jnp.array([[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        np.testing.assert_array_equal(escaped(f, p, v), [True, False, True])


class TestUpres:
    def test_identity(self):
        n = jnp.arange(27.0).reshape(3, 3, 3)
        out = upres_volume(n, (3, 3, 3))
        np.testing.assert_allclose(out, n, atol=1e-5)

    def test_linear_preserved(self):
        # a linear ramp upsamples exactly
        x = jnp.linspace(0, 1, 5)
        n = x[:, None, None] + 0 * x[None, :, None] + 0 * x[None, None, :]
        n = jnp.broadcast_to(n, (5, 5, 5))
        out = upres_volume(n, (9, 9, 9))
        expect = jnp.broadcast_to(jnp.linspace(0, 1, 9)[:, None, None], (9, 9, 9))
        np.testing.assert_allclose(out, expect, atol=1e-6)

    def test_1d(self):
        n = jnp.array([0.0, 1.0, 2.0])
        out = upres_volume(n, (5,))
        np.testing.assert_allclose(out, [0.0, 0.5, 1.0, 1.5, 2.0], atol=1e-6)


class TestCylinder:
    def make(self, key, res=9, radius=1.0, length=4.0):
        data = 1.0 + jax.random.uniform(key, (res,))
        return CylinderField(data, radius, length)

    def test_grad_matches_autodiff(self):
        f = self.make(jax.random.PRNGKey(11))
        key = jax.random.PRNGKey(12)
        # points inside the cylinder, away from the axis
        theta = jax.random.uniform(key, (16,), minval=0, maxval=2 * np.pi)
        r = jax.random.uniform(jax.random.PRNGKey(13), (16,), minval=0.1, maxval=0.9)
        y = jax.random.uniform(jax.random.PRNGKey(14), (16,), minval=0.5, maxval=3.5)
        p = jnp.stack([f.radius + r * jnp.cos(theta), y,
                       f.radius + r * jnp.sin(theta)], axis=-1)

        def value(pt):
            n, _ = cyl_eval_grad(f, pt[None, :])
            return n[0]

        _, fx = cyl_eval_grad(f, p)
        for i in range(4):
            gi = jax.grad(value)(p[i])
            np.testing.assert_allclose(fx[i], gi, rtol=1e-4, atol=1e-5)

    def test_axis_singularity(self):
        f = self.make(jax.random.PRNGKey(15))
        p = jnp.array([[f.radius, 1.0, f.radius]])
        n, fx = cyl_eval_grad(f, p)
        np.testing.assert_allclose(fx, 0.0)
        assert jnp.isfinite(n).all()

    def test_splat_transpose(self):
        key = jax.random.PRNGKey(16)
        f = self.make(key)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        theta = jax.random.uniform(k1, (16,), minval=0, maxval=2 * np.pi)
        r = jax.random.uniform(k2, (16,), minval=0.1, maxval=0.9)
        p = jnp.stack([f.radius + r * jnp.cos(theta),
                       jnp.ones(16),
                       f.radius + r * jnp.sin(theta)], axis=-1)
        val = jax.random.normal(k3, (16,))
        g = jax.random.normal(k4, (16, 3))
        # project g onto the radial plane contribution only for comparison:
        u = jax.random.normal(jax.random.PRNGKey(17), f.data.shape)

        delta = cyl_splat_delta(f, p, val, g)
        lhs = jnp.vdot(delta, u)

        uf = CylinderField(u, f.radius, f.length)
        n_u, grad_u = cyl_eval_grad(uf, p)
        rhs = jnp.sum(val * n_u) + jnp.sum(g * grad_u)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4)

    def test_hess_matches_autodiff(self):
        f = self.make(jax.random.PRNGKey(18))
        p = jnp.array([[f.radius + 0.43, 1.0, f.radius + 0.21],
                       [f.radius - 0.3, 2.0, f.radius + 0.55]])

        def gradfn(pt):
            _, fx = cyl_eval_grad(f, pt[None, :])
            return fx[0]

        hxx, hxz, hzz = cyl_eval_hess(f, p)
        for i in range(2):
            H = jax.jacfwd(gradfn)(p[i])
            # radial direction second derivative lives off this projection;
            # the reference Hessian only keeps the (rx/r)(I - xhat xhat^T)
            # curvature term, so compare the tangential part analytically.
            xs = p[i] - f.radius
            xs = xs.at[1].set(0.0)
            r = jnp.linalg.norm(xs)
            xhat = xs / r
            res = f.data.shape[0]
            h = f.radius / (res - 1)
            rm = r / h
            i0 = jnp.clip(jnp.floor(rm).astype(int), 0, res - 1)
            i1 = jnp.clip(i0 + 1, 0, res - 1)
            rx = (f.data[i1] - f.data[i0]) / h
            expect_xx = (rx / r) * (1 - xhat[0] ** 2)
            expect_xz = (rx / r) * (-xhat[0] * xhat[2])
            expect_zz = (rx / r) * (1 - xhat[2] ** 2)
            np.testing.assert_allclose(hxx[i], expect_xx, rtol=1e-4)
            np.testing.assert_allclose(hxz[i], expect_xz, rtol=1e-4)
            np.testing.assert_allclose(hzz[i], expect_zz, rtol=1e-4)

    def test_bounds(self):
        f = CylinderField(jnp.ones(5), 1.0, 4.0)
        p = jnp.array([[1.0, 2.0, 1.0],    # center: in
                       [1.0, -0.1, 1.0],   # below cap: out
                       [2.05, 2.0, 1.0]])  # outside radius: out
        np.testing.assert_array_equal(cyl_inbounds(f, p), [True, False, False])

    def test_escaped(self):
        f = CylinderField(jnp.ones(5), 1.0, 4.0)
        p = jnp.array([[2.5, 2.0, 1.0], [2.5, 2.0, 1.0], [1.0, -0.5, 1.0]])
        v = jnp.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
        np.testing.assert_array_equal(cyl_escaped(f, p, v), [True, False, True])

    def test_midpoint_upres(self):
        n = jnp.array([1.0, 2.0, 4.0])
        out = upres_profile_midpoint(n)
        np.testing.assert_allclose(out, [1.0, 1.5, 2.0, 3.0, 4.0])


class TestSdfUtils:
    def test_get_pts_sdf_projects_to_surface(self):
        import numpy as np
        from adjointnonlinearraytracing_tpu.fields import get_pts_sdf

        res, width = 17, 2.0
        h = width / (res - 1)
        idx = np.arange(res) * h
        z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
        # voxel-unit sdf (reference convention, grid.py:338)
        sdf = jnp.asarray(
            (np.sqrt((x - 1) ** 2 + (y - 1) ** 2 + (z - 1) ** 2) - 0.7) / h)
        pos, vel = get_pts_sdf(jax.random.PRNGKey(0), sdf, 128, width)
        r = jnp.linalg.norm(pos - 1.0, axis=-1)
        assert float((jnp.abs(r - 0.7) < 0.05).mean()) > 0.95
        # vel points inward
        inward = jnp.einsum("nd,nd->n", vel, (1.0 - pos))
        assert float((inward > 0).mean()) > 0.95

    def test_get_opp_pts_crosses(self):
        import numpy as np
        from adjointnonlinearraytracing_tpu.fields import get_opp_pts

        res, width = 17, 2.0
        h = width / (res - 1)
        idx = np.arange(res) * h
        z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
        sdf = jnp.asarray(
            np.sqrt((x - 1) ** 2 + (y - 1) ** 2 + (z - 1) ** 2) - 0.7)
        pts = jnp.array([[1.0, 0.35, 1.0]])  # inside, near bottom of sphere
        v = jnp.array([[0.0, 1.0, 0.0]])
        out = get_opp_pts(sdf, pts, v, width)
        # exits through the top: y > center
        assert float(out[0, 1]) > 1.0


class TestRenderHelpers:
    def test_render_gradient_shape(self):
        from adjointnonlinearraytracing_tpu.fields import RbfGrid, render_gradient

        g = render_gradient(RbfGrid.create(jnp.ones((5, 5)), 1.0))
        assert g.shape == (5, 5, 2)

    def test_cyl_render(self):
        from adjointnonlinearraytracing_tpu.fields import (CylinderField,
                                                           cyl_render,
                                                           cyl_render2)

        f = CylinderField(jnp.linspace(1.5, 1.0, 9), 1.0, 4.0)
        vol = cyl_render(f, (6, 6, 6))
        assert vol.shape == (6, 6, 6)
        im = cyl_render2(f, 8)
        assert im.shape == (8, 8)
        # center of the slice is on the cylinder axis -> peak index
        assert float(im[4, 0]) > float(im[0, 0])


class TestRbfToolkit:
    """Deeper coverage of the sensor-grid toolkit (core/grid.py twins)."""

    def _grid(self, key, res=12, h=0.5, ndim=2):
        from adjointnonlinearraytracing_tpu.fields import rbf

        scene = jax.random.uniform(key, (res,) * ndim)
        return rbf.RbfGrid(scene, jnp.zeros_like(scene), h)

    def test_get_linear_matches_autodiff(self):
        from adjointnonlinearraytracing_tpu.fields import rbf

        g = self._grid(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 2), minval=0.5,
                               maxval=5.0)

        def value(pt):
            f, _ = rbf.get_linear(g, pt[None, :])
            return f[0]

        f, fx = rbf.get_linear(g, x)
        for i in range(4):
            gi = jax.grad(value)(x[i])
            np.testing.assert_allclose(fx[i], gi, rtol=1e-6, atol=1e-9)

    def test_splat_linear_transpose(self):
        """splat_linear's (value, grad) accumulation is h-scaled as in the
        reference (grid.py:308: dot term carries an h factor)."""
        from adjointnonlinearraytracing_tpu.fields import rbf

        g0 = self._grid(jax.random.PRNGKey(2))
        zero = rbf.RbfGrid(jnp.zeros_like(g0.scene),
                           jnp.zeros_like(g0.scene), g0.h)
        x = jax.random.uniform(jax.random.PRNGKey(3), (8, 2), minval=1.0,
                               maxval=4.0)
        f = jax.random.normal(jax.random.PRNGKey(4), (8,))
        fx = jax.random.normal(jax.random.PRNGKey(5), (8, 2))

        out = rbf.splat_linear(zero, x, f, fx)
        # dot-product check against get_linear on a probe field
        u = jax.random.normal(jax.random.PRNGKey(6), g0.scene.shape)
        lhs = jnp.vdot(out.scene, u)
        uf = rbf.RbfGrid(u, jnp.zeros_like(u), g0.h)
        fu, fxu = rbf.get_linear(uf, x)
        rhs = jnp.sum(f * fu) + g0.h * jnp.sum(fx * fxu) * g0.h
        # reference scales the gradient dot by h (and fx by 1/h in get) —
        # net factor h^0: verify equality with the value+h*grad convention
        rhs = jnp.sum(f * fu) + jnp.sum(fx * (fxu * g0.h)) * g0.h
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_get_spline_matches_autodiff(self):
        from adjointnonlinearraytracing_tpu.fields import rbf

        g = self._grid(jax.random.PRNGKey(7), ndim=2)
        x = jax.random.uniform(jax.random.PRNGKey(8), (8, 2), minval=1.5,
                               maxval=4.0)

        def value(pt):
            f, _ = rbf.get_spline(g, pt[None, :])
            return f[0]

        f, fx = rbf.get_spline(g, x)
        for i in range(3):
            gi = jax.grad(value)(x[i])
            np.testing.assert_allclose(fx[i], gi, rtol=1e-4, atol=1e-7)

    def test_solve_grad_reconstructs(self):
        """SolveGrad fits stencil values so a following Get reproduces the
        requested (value, gradient) samples."""
        from adjointnonlinearraytracing_tpu.fields import rbf

        res, h = 12, 0.5
        zero = rbf.RbfGrid(jnp.zeros((res, res)), jnp.zeros((res, res)), h)
        x = jnp.array([[2.7, 3.1]])
        f = jnp.array([1.5])
        fx = jnp.array([[0.3, -0.2]])
        out = rbf.solve_grad(zero, x, f, fx)
        rendered = out.render()
        rg = rbf.RbfGrid(rendered, jnp.zeros_like(rendered), h)
        f2, fx2 = rbf.get(rg, x)
        np.testing.assert_allclose(f2, f, rtol=0.05)

    def test_splat_grad_runs(self):
        from adjointnonlinearraytracing_tpu.fields import rbf

        zero = rbf.RbfGrid(jnp.zeros((12, 12)), jnp.zeros((12, 12)), 0.5)
        x = jnp.array([[2.7, 3.1], [1.2, 2.2]])
        out = rbf.splat_grad(zero, x, jnp.ones(2), 0.1 * jnp.ones((2, 2)))
        assert jnp.isfinite(out.scene).all()
        assert float(out.weights.sum()) > 0

"""Sharded trace/adjoint must match single-device results exactly.

Runs on the 8-device virtual CPU mesh (conftest).  This is the multi-chip
correctness story: rays sharded over the mesh, replicated grid, psum'd
voxel gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu import tracer
from adjointnonlinearraytracing_tpu.parallel.mesh import (
    make_ray_mesh, make_sharded_trace, make_sharded_trace_plane, pad_rays,
    shard_rays, replicate,
)
from tests.test_tracer import bump_field, entry_rays


class TestShardedTrace:
    def setup_method(self):
        self.mesh = make_ray_mesh()
        self.res, self.h = 9, 1.0
        self.ds = 0.5
        self.rif = bump_field(self.res, self.h, amp=0.2)
        self.x, self.v = entry_rays(32, self.res, self.h, seed=1)

    def test_forward_matches(self):
        f = make_sharded_trace(self.mesh, self.h, self.ds, self.res)
        xt_s, vt_s = f(self.rif, self.x, self.v)
        xt, vt = tracer.trace(self.rif, self.x, self.v, self.h, self.ds)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(vt_s, vt, atol=1e-12)

    def test_gradient_matches(self):
        f = make_sharded_trace(self.mesh, self.h, self.ds, self.res)

        def loss_sharded(r):
            xt, vt = f(r, self.x, self.v)
            return jnp.sum(xt ** 2) + jnp.sum(vt)

        def loss_single(r):
            xt, vt = tracer.trace(r, self.x, self.v, self.h, self.ds)
            return jnp.sum(xt ** 2) + jnp.sum(vt)

        g_s = jax.jit(jax.grad(loss_sharded))(self.rif)
        g = jax.grad(loss_single)(self.rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_gradient_matches_with_device_put(self):
        f = make_sharded_trace(self.mesh, self.h, self.ds, self.res)
        x, v = shard_rays(self.mesh, self.x, self.v)
        rif = replicate(self.mesh, self.rif)

        def loss_sharded(r):
            xt, vt = f(r, x, v)
            return jnp.sum(xt ** 2)

        def loss_single(r):
            xt, vt = tracer.trace(r, self.x, self.v, self.h, self.ds)
            return jnp.sum(xt ** 2)

        g_s = jax.jit(jax.grad(loss_sharded))(rif)
        g = jax.grad(loss_single)(self.rif)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g),
                                   rtol=1e-10, atol=1e-12)

    def test_plane_variant(self):
        span = (self.res - 1) * self.h
        n = self.x.shape[0]
        po = jnp.tile(jnp.array([[0.0, span + 1.0, 0.0]]), (n, 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        f = make_sharded_trace_plane(self.mesh, self.h, self.ds, self.res)

        xt_s, vt_s, miss_s = f(self.rif, self.x, self.v, po, pd)
        xt, vt, miss = tracer.trace_plane(self.rif, self.x, self.v, po, pd,
                                          self.h, self.ds)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_array_equal(miss_s, miss)

        def loss_sharded(r):
            xt, vt, _ = f(r, self.x, self.v, po, pd)
            return jnp.sum(xt ** 2)

        def loss_single(r):
            xt, vt, _ = tracer.trace_plane(r, self.x, self.v, po, pd,
                                           self.h, self.ds)
            return jnp.sum(xt ** 2)

        g_s = jax.jit(jax.grad(loss_sharded))(self.rif)
        g = jax.grad(loss_single)(self.rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_pad_rays(self):
        x = jnp.ones((13, 3))
        xp, mask = pad_rays(x, 8)
        assert xp.shape == (16, 3)
        assert int(mask.sum()) == 13
        xp2, mask2 = pad_rays(jnp.ones((16, 3)), 8)
        assert xp2.shape == (16, 3)
        assert bool(mask2.all())


class TestShardedTarget:
    def test_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_target)

        mesh = make_ray_mesh()
        res, h, ds = 9, 1.0, 0.5
        rif = bump_field(res, h, amp=0.2)
        x, v = entry_rays(16, res, h, seed=2)
        span = (res - 1) * h
        tgt = jnp.tile(jnp.array([[span / 2, span / 2, span / 2]]), (16, 1))

        f = make_sharded_trace_target(mesh, h, ds, res)
        xt_s, vt_s, d2_s = f(rif, x, v, tgt)
        xt, vt, d2 = tracer.trace_target(rif, x, v, tgt, h, ds)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(d2_s, d2, atol=1e-12)

        g_s = jax.jit(jax.grad(lambda r: jnp.sum(f(r, x, v, tgt)[0] ** 2)))(rif)
        g = jax.grad(lambda r: jnp.sum(
            tracer.trace_target(r, x, v, tgt, h, ds)[0] ** 2))(rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)


class TestShardedExact:
    def test_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_exact)

        mesh = make_ray_mesh()
        res, h, ds = 9, 1.0, 0.5
        rif = bump_field(res, h, amp=0.2)
        x, v = entry_rays(16, res, h, seed=3)

        f = make_sharded_trace_exact(mesh, h, ds, res, seg=8)
        xt_s, vt_s = f(rif, x, v)
        xt, vt = tracer.trace_exact(rif, x, v, h, ds, 8)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)

        g_s = jax.jit(jax.grad(lambda r: jnp.sum(f(r, x, v)[0] ** 2)))(rif)
        g = jax.grad(lambda r: jnp.sum(
            tracer.trace_exact(r, x, v, h, ds, 8)[0] ** 2))(rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_chunked_matches_single_device(self, monkeypatch):
        """Per-shard microbatching (ANRT_EXACT_CHUNK below the 4-ray shard
        size) must not change outputs or gradients (VERDICT r4 #1)."""
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_exact)

        mesh = make_ray_mesh()
        res, h, ds = 9, 1.0, 0.5
        rif = bump_field(res, h, amp=0.2)
        x, v = entry_rays(32, res, h, seed=3)  # 4 rays/shard

        monkeypatch.setenv("ANRT_EXACT_CHUNK", "2")
        f = make_sharded_trace_exact(mesh, h, ds, res, seg=8)
        xt_s, vt_s = f(rif, x, v)
        monkeypatch.setenv("ANRT_EXACT_CHUNK", "0")
        xt, vt = tracer.trace_exact(rif, x, v, h, ds, 8)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(vt_s, vt, atol=1e-12)

        monkeypatch.setenv("ANRT_EXACT_CHUNK", "2")
        g_s = jax.jit(jax.grad(lambda r: jnp.sum(f(r, x, v)[0] ** 2)))(rif)
        monkeypatch.setenv("ANRT_EXACT_CHUNK", "0")
        g = jax.grad(lambda r: jnp.sum(
            tracer.trace_exact(r, x, v, h, ds, 8)[0] ** 2))(rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)


class TestShardedVariantCoverage:
    """VERDICT r4 #7: sdf/cable sharded builders + exact=True options, so
    every trace variant can run sharded AND drift-free."""

    def _sdf_case(self):
        res, h = 9, 1.0
        rif = bump_field(res, h, amp=0.2)
        idx = jnp.arange(res, dtype=jnp.float64) * h
        z, y, x = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = (res - 1) * h / 2
        sdf = jnp.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 3.0
        xs, vs = entry_rays(16, res, h, seed=6)
        xs = xs.at[:, 1].set(c)
        xs = xs.at[:, 0].set(jnp.clip(xs[:, 0], c - 2.0, c + 2.0))
        xs = xs.at[:, 2].set(jnp.clip(xs[:, 2], c - 2.0, c + 2.0))
        return rif, sdf, xs, vs, h

    def test_sdf_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_sdf)

        mesh = make_ray_mesh()
        rif, sdf, x, v, h = self._sdf_case()
        ds = 0.25

        for exact in (False, True):
            f = make_sharded_trace_sdf(mesh, h, ds, 9, exact=exact, seg=8)
            xt_s, vt_s = f(rif, sdf, x, v)
            xt, vt = tracer.trace_sdf(rif, sdf, x, v, h, ds)
            np.testing.assert_allclose(xt_s, xt, atol=1e-12)
            np.testing.assert_allclose(vt_s, vt, atol=1e-12)

            g_s = jax.jit(jax.grad(
                lambda r: jnp.sum(f(r, sdf, x, v)[0] ** 2)))(rif)
            ref = (tracer.trace_sdf_exact if exact else tracer.trace_sdf)
            args = (x, v, h, ds, 8) if exact else (x, v, h, ds)
            g = jax.grad(lambda r: jnp.sum(
                ref(r, sdf, *args)[0] ** 2))(rif)
            np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_cable_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_cable)

        mesh = make_ray_mesh()
        prof = 1.0 + 0.1 * jnp.linspace(1.0, 0.0, 9) ** 2
        n = 16
        key = jax.random.PRNGKey(4)
        xy = 0.3 * jax.random.normal(key, (n, 2))
        xc = jnp.stack([1.0 + xy[:, 0], jnp.full((n,), 0.01),
                        1.0 + xy[:, 1]], axis=-1)
        vc = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        tg = jnp.tile(jnp.array([[1.0, 3.5, 1.0]]), (n, 1))
        ds = 0.02

        for exact in (False, True):
            f = make_sharded_trace_cable(mesh, 1.0, 4.0, ds, exact=exact,
                                         seg=16)
            xt_s, vt_s, d2_s = f(prof, xc, vc, tg)
            xt, vt, d2 = tracer.trace_cable(prof, 1.0, 4.0, xc, vc, tg, ds)
            np.testing.assert_allclose(xt_s, xt, atol=1e-12)
            np.testing.assert_allclose(d2_s, d2, atol=1e-12)

            g_s = jax.jit(jax.grad(
                lambda r: jnp.sum(f(r, xc, vc, tg)[0] ** 2)))(prof)
            if exact:
                g = jax.grad(lambda r: jnp.sum(tracer.trace_cable_exact(
                    r, 1.0, 4.0, xc, vc, tg, ds, 16)[0] ** 2))(prof)
            else:
                g = jax.grad(lambda r: jnp.sum(tracer.trace_cable(
                    r, 1.0, 4.0, xc, vc, tg, ds)[0] ** 2))(prof)
            np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_plane_exact_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_plane)

        mesh = make_ray_mesh()
        res, h, ds = 9, 1.0, 0.25
        rif = bump_field(res, h, amp=0.2)
        x, v = entry_rays(16, res, h, seed=8)
        po = jnp.tile(jnp.array([[0.0, 4.0, 0.0]]), (16, 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (16, 1))

        f = make_sharded_trace_plane(mesh, h, ds, res, exact=True, seg=8)
        xt_s, vt_s, miss_s = f(rif, x, v, po, pd)
        xt, vt, miss = tracer.trace_plane_exact(rif, x, v, po, pd, h, ds, 8)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_array_equal(miss_s, miss)

        g_s = jax.jit(jax.grad(
            lambda r: jnp.sum(f(r, x, v, po, pd)[0] ** 2)))(rif)
        g = jax.grad(lambda r: jnp.sum(tracer.trace_plane_exact(
            r, x, v, po, pd, h, ds, 8)[0] ** 2))(rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)

    def test_target_exact_matches_single_device(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace_target)

        mesh = make_ray_mesh()
        res, h, ds = 9, 1.0, 0.25
        rif = bump_field(res, h, amp=0.25)
        x, v = entry_rays(16, res, h, seed=9)
        tgt = jnp.tile(jnp.array([[4.0, 9.0, 4.0]]), (16, 1))

        f = make_sharded_trace_target(mesh, h, ds, res, exact=True, seg=8)
        xt_s, vt_s, d2_s = f(rif, x, v, tgt)
        xt, vt, d2 = tracer.trace_target_exact(rif, x, v, tgt, h, ds, 8)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(d2_s, d2, atol=1e-12)

        g_s = jax.jit(jax.grad(
            lambda r: jnp.sum(f(r, x, v, tgt)[0] ** 2)))(rif)
        g = jax.grad(lambda r: jnp.sum(tracer.trace_target_exact(
            r, x, v, tgt, h, ds, 8)[0] ** 2))(rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-10, atol=1e-12)


class TestAutoPad:
    def test_make_trace_mesh_handles_indivisible_counts(self):
        from adjointnonlinearraytracing_tpu.experiments import common

        res, h = 9, 1.0
        rif = bump_field(res, h, amp=0.2)
        x, v = entry_rays(13, res, h, seed=4)  # 13 not divisible by 8
        trace = common.make_trace(8.0, 0.5, use_mesh=True)

        xt, vt = trace(rif, x, v)
        assert xt.shape == (13, 3)
        ref = common.make_trace(8.0, 0.5)(rif, x, v)
        np.testing.assert_allclose(xt, ref[0], atol=1e-12)

        g = jax.grad(lambda r: jnp.sum(trace(r, x, v)[0] ** 2))(rif)
        g_ref = jax.grad(lambda r: jnp.sum(
            common.make_trace(8.0, 0.5)(r, x, v)[0] ** 2))(rif)
        np.testing.assert_allclose(g, g_ref, rtol=1e-10, atol=1e-12)

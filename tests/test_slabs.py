"""Slab-sharded (ring-rotation) grid trace/adjoint must match the replicated
single-device tracer exactly (VERDICT r3 #8 / ROADMAP grid-sharding row).

Runs on the 8-device virtual CPU mesh (conftest): device d owns ray shard d
and z-slab d; slabs rotate via ppermute while frozen lanes wait.
"""

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu import tracer
from adjointnonlinearraytracing_tpu.parallel.mesh import make_ray_mesh
from adjointnonlinearraytracing_tpu.parallel.slabs import (
    build_slab_tables, make_slab_trace, slab_rows)
from adjointnonlinearraytracing_tpu.fields.grid import GridField
from adjointnonlinearraytracing_tpu.fields import cells as CT
from tests.test_tracer import bump_field, entry_rays


class TestSlabTables:
    def test_partition_covers_table(self):
        field = GridField(bump_field(9, 1.0, amp=0.2), 1.0)
        slabs, S = build_slab_tables(field, 8)
        cf = CT.build_cell_table(field)
        d1, h1, w1, _ = cf.table.shape
        assert S == slab_rows(d1, 8)
        rows = slabs.reshape(-1, 8)[: d1 * h1 * w1]
        np.testing.assert_array_equal(
            np.asarray(rows), np.asarray(cf.table.reshape(-1, 8)))


class TestSlabTrace:
    def setup_method(self):
        self.mesh = make_ray_mesh()
        self.res, self.h = 9, 1.0
        self.ds = 0.5
        self.rif = bump_field(self.res, self.h, amp=0.2)
        self.x, self.v = entry_rays(32, self.res, self.h, seed=7)

    def test_forward_matches(self):
        f = make_slab_trace(self.mesh, self.h, self.ds, self.res)
        xt_s, vt_s = f(self.rif, self.x, self.v)
        xt, vt = tracer.trace(self.rif, self.x, self.v, self.h, self.ds)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(vt_s, vt, atol=1e-12)

    def test_gradient_matches(self):
        f = make_slab_trace(self.mesh, self.h, self.ds, self.res)

        def loss_slab(r):
            xt, vt = f(r, self.x, self.v)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        def loss_single(r):
            xt, vt = tracer.trace(r, self.x, self.v, self.h, self.ds)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        g_s = jax.jit(jax.grad(loss_slab))(self.rif)
        g = jax.grad(loss_single)(self.rif)
        np.testing.assert_allclose(g_s, g, rtol=1e-9, atol=1e-12)

    def test_downward_rays(self):
        """Rays marching against the rotation direction (-z) still finish
        (they wait one revolution per slab crossing)."""
        n = 16
        key = jax.random.PRNGKey(3)
        span = (self.res - 1) * self.h
        xz = jax.random.uniform(key, (n, 2), minval=0.3 * span,
                                maxval=0.7 * span, dtype=jnp.float64)
        x = jnp.stack([xz[:, 0], xz[:, 1],
                       jnp.full((n,), span + 0.4, jnp.float64)], axis=-1)
        v = jnp.tile(jnp.asarray([[0.02, -0.03, -1.0]], jnp.float64), (n, 1))
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        f = make_slab_trace(self.mesh, self.h, self.ds, self.res)
        xt_s, vt_s = f(self.rif, x, v)
        xt, vt = tracer.trace(self.rif, x, v, self.h, self.ds)
        np.testing.assert_allclose(xt_s, xt, atol=1e-12)
        np.testing.assert_allclose(vt_s, vt, atol=1e-12)

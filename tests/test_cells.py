"""Cell-table fast path must be numerically equivalent to the reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu.fields import cells as CT
from adjointnonlinearraytracing_tpu.fields import grid as G
from adjointnonlinearraytracing_tpu.tracer import eikonal as E
from adjointnonlinearraytracing_tpu.tracer import fast as F
from tests.test_tracer import bump_field, entry_rays


def rand_field(key, res=7, h=0.8):
    return G.GridField(1.0 + jax.random.uniform(key, (res, res, res)), h)


class TestCellTable:
    def test_eval_matches_everywhere(self):
        """Including far out-of-range points (border-clamp parity)."""
        f = rand_field(jax.random.PRNGKey(0))
        cf = CT.build_cell_table(f)
        key = jax.random.PRNGKey(1)
        span = (f.data.shape[0] - 1) * f.h
        # points inside, near borders, and far outside
        p = jnp.concatenate([
            jax.random.uniform(key, (64, 3), minval=0.0, maxval=span),
            jax.random.uniform(jax.random.PRNGKey(2), (32, 3),
                               minval=-2 * span, maxval=3 * span),
        ])
        n_ref, nx_ref = G.eval_grad(f, p)
        vals, w0, _ = CT.fetch(cf, p)
        n, nx = CT.eval_grad_from(vals, w0, f.h)
        np.testing.assert_allclose(n, n_ref, atol=1e-12)
        np.testing.assert_allclose(nx, nx_ref, atol=1e-12)

    def test_eval_masked(self):
        f = rand_field(jax.random.PRNGKey(3))
        cf = CT.build_cell_table(f)
        p = jax.random.uniform(jax.random.PRNGKey(4), (16, 3), minval=0.5,
                               maxval=3.0)
        mask = jnp.arange(16) % 2 == 0
        n_ref, nx_ref = G.eval_grad(f, p, mask)
        vals, w0, _ = CT.fetch(cf, p, mask)
        n, nx = CT.eval_grad_from(vals, w0, f.h)
        np.testing.assert_allclose(n, n_ref, atol=1e-12)
        np.testing.assert_allclose(nx, nx_ref, atol=1e-12)

    def test_hess_matches(self):
        f = rand_field(jax.random.PRNGKey(5))
        cf = CT.build_cell_table(f)
        p = jax.random.uniform(jax.random.PRNGKey(6), (32, 3), minval=0.5,
                               maxval=4.0)
        h_ref = G.eval_hess(f, p)
        vals, w0, _ = CT.fetch(cf, p)
        h_fast = CT.eval_hess_from(vals, w0, f.h)
        for a, b in zip(h_fast, h_ref):
            np.testing.assert_allclose(a, b, atol=1e-12)

    def test_scatter_fold_matches_splat(self):
        """row-scatter + fold == the reference 8-way scatter splat."""
        f = rand_field(jax.random.PRNGKey(7))
        cf = CT.build_cell_table(f)
        key = jax.random.PRNGKey(8)
        p = jnp.concatenate([
            jax.random.uniform(key, (48, 3), minval=0.2, maxval=4.5),
            jax.random.uniform(jax.random.PRNGKey(9), (16, 3),
                               minval=-3.0, maxval=8.0),
        ])
        val = jax.random.normal(jax.random.PRNGKey(10), (64,))
        gvec = jax.random.normal(jax.random.PRNGKey(11), (64, 3))
        mask = jax.random.bernoulli(jax.random.PRNGKey(12), 0.8, (64,))

        ref = G.splat_delta(f, p, val, gvec, mask).reshape(f.data.shape)

        ci, w0 = CT.cell_index(cf, p)
        contrib = CT.splat_rows(w0, val, gvec, f.h, mask=mask)
        cg = CT.scatter_rows(CT.zero_cell_grad(cf), ci, contrib)
        fast = CT.fold_cell_grad(cg, cf)
        np.testing.assert_allclose(fast, ref, atol=1e-10)


class TestFastSteppers:
    def setup_method(self):
        self.res, self.h = 9, 1.0
        self.rif = bump_field(self.res, self.h, amp=0.25)
        self.field = G.GridField(self.rif, self.h)
        self.x, self.v = entry_rays(24, self.res, self.h, seed=21)
        self.ds = 0.5
        self.steps = E.max_steps_fwd(self.res, self.h, self.ds)

    def test_trace_identical(self):
        a = E.trace(self.field, self.x, self.v, self.ds, self.steps)
        b = F.trace(self.field, self.x, self.v, self.ds, self.steps)
        for u, w in zip(a, b):
            np.testing.assert_allclose(u, w, atol=1e-12)

    def test_plane_identical(self):
        span = (self.res - 1) * self.h
        n = self.x.shape[0]
        po = jnp.tile(jnp.array([[0.0, span / 2, 0.0]]), (n, 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (n, 1))
        a = E.trace_plane(self.field, self.x, self.v, po, pd, self.ds, self.steps)
        b = F.trace_plane(self.field, self.x, self.v, po, pd, self.ds, self.steps)
        np.testing.assert_allclose(a[0], b[0], atol=1e-12)
        np.testing.assert_array_equal(a[2], b[2])

    def test_target_identical(self):
        span = (self.res - 1) * self.h
        t = jnp.tile(jnp.array([[span / 2, span / 2, span / 2]]),
                     (self.x.shape[0], 1))
        a = E.trace_target(self.field, self.x, self.v, t, self.ds, self.steps)
        b = F.trace_target(self.field, self.x, self.v, t, self.ds, self.steps)
        for u, w in zip(a, b):
            np.testing.assert_allclose(u, w, atol=1e-12)

    def test_sdf_identical(self):
        res = self.res
        idx = jnp.arange(res, dtype=jnp.float64) * self.h
        z, y, x3 = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = (res - 1) * self.h / 2
        sdf_data = jnp.sqrt((x3 - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 3.0
        sdf = G.GridField(sdf_data, self.h)
        x = jnp.array([[c + 0.5, c - 2.7, c], [c, c - 2.8, c + 0.3]])
        v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (2, 1))
        a = E.trace_sdf(self.field, sdf, x, v, self.ds, self.steps)
        b = F.trace_sdf(self.field, sdf, x, v, self.ds, self.steps)
        for u, w in zip(a, b):
            np.testing.assert_allclose(u, w, atol=1e-12)

    def test_backtrace_identical(self):
        xt, vt = E.trace(self.field, self.x, self.v, self.ds, self.steps)
        key = jax.random.PRNGKey(22)
        dx = jax.random.normal(key, xt.shape)
        dv = jax.random.normal(jax.random.PRNGKey(23), vt.shape)
        sb = E.max_steps_bwd(self.res, self.h, self.ds)
        g_ref = E.backtrace(self.field, xt, vt, dx, dv, self.ds, sb)
        g_fast = F.backtrace(self.field, xt, vt, dx, dv, self.ds, sb)
        np.testing.assert_allclose(g_fast, g_ref, atol=1e-10)

    def test_backtrace_sdf_identical(self):
        res = self.res
        idx = jnp.arange(res, dtype=jnp.float64) * self.h
        z, y, x3 = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = (res - 1) * self.h / 2
        sdf_data = jnp.sqrt((x3 - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 3.0
        sdf = G.GridField(sdf_data, self.h)
        x = jnp.array([[c + 0.5, c - 2.7, c], [c, c - 2.8, c + 0.3]])
        v = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (2, 1))
        xt, vt = E.trace_sdf(self.field, sdf, x, v, self.ds, self.steps)
        dx = jnp.ones_like(xt)
        dv = 0.5 * jnp.ones_like(vt)
        sb = E.max_steps_bwd(self.res, self.h, self.ds)
        g_ref = E.backtrace_sdf(self.field, sdf, xt, vt, dx, dv, self.ds, sb)
        g_fast = F.backtrace_sdf(self.field, sdf, xt, vt, dx, dv, self.ds, sb)
        np.testing.assert_allclose(g_fast, g_ref, atol=1e-10)

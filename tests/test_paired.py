"""Paired window stepper must be numerically equivalent to the classic path.

tracer/paired.py changes the data movement (one (N, 125) snapped-window
gather per two substeps, one (N, 125) window-row scatter per pair) but not
the math; results must match tracer/fast.py to summation-reordering
tolerance at f64.
"""

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu.fields import grid as G
from adjointnonlinearraytracing_tpu.fields import windows as WD
from adjointnonlinearraytracing_tpu.fields import cells as CT
from adjointnonlinearraytracing_tpu.tracer import api
from adjointnonlinearraytracing_tpu.tracer import eikonal as E
from adjointnonlinearraytracing_tpu.tracer import fast as F
from adjointnonlinearraytracing_tpu.tracer import paired as PD
from tests.test_tracer import bump_field, entry_rays

ATOL = 1e-11


def rand_field(key, res=7, h=0.8):
    return G.GridField(1.0 + jax.random.uniform(key, (res, res, res)), h)


class TestWindowEval:
    def test_eval_matches_classic_everywhere(self):
        """Anchor-cell eval (static offset 1), incl. far out-of-range points."""
        f = rand_field(jax.random.PRNGKey(0))
        wf = WD.build_window_table(f)
        span = (f.data.shape[0] - 1) * f.h
        p = jnp.concatenate([
            jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.0,
                               maxval=span),
            jax.random.uniform(jax.random.PRNGKey(2), (32, 3),
                               minval=-2 * span, maxval=3 * span),
        ])
        n_ref, nx_ref = G.eval_grad(f, p)
        h_ref = G.eval_hess(f, p)
        W, a3, ci3, w0 = WD.fetch_window(wf, p)
        n, nx, hess = WD.eval_window(W, ci3 - a3, w0, f.h, want_hess=True)
        np.testing.assert_allclose(n, n_ref, atol=ATOL)
        np.testing.assert_allclose(nx, nx_ref, atol=ATOL)
        for a, b in zip(hess, h_ref):
            np.testing.assert_allclose(a, b, atol=ATOL)

    def test_offset_eval_matches(self):
        """Eval at a *neighbor* cell through the anchored window."""
        f = rand_field(jax.random.PRNGKey(3))
        wf = WD.build_window_table(f)
        span = (f.data.shape[0] - 1) * f.h
        key = jax.random.PRNGKey(4)
        p_anchor = jax.random.uniform(key, (128, 3), minval=0.0, maxval=span)
        # perturb by up to one cell in any direction
        delta = jax.random.uniform(jax.random.PRNGKey(5), (128, 3),
                                   minval=-f.h, maxval=f.h)
        p_eval = p_anchor + delta

        ci3_a, _ = WD.cell_index3(wf, p_anchor)
        a3, row = WD.anchor_row(wf, ci3_a)
        W = wf.table[row]
        ci3_b, w0 = WD.cell_index3(wf, p_eval)
        off3 = ci3_b - a3
        assert int(jnp.min(off3)) >= 0 and int(jnp.max(off3)) <= 3

        n, nx = WD.eval_window(W, off3, w0, f.h)
        n_ref, nx_ref = G.eval_grad(f, p_eval)
        np.testing.assert_allclose(n, n_ref, atol=ATOL)
        np.testing.assert_allclose(nx, nx_ref, atol=ATOL)

    def test_masked(self):
        f = rand_field(jax.random.PRNGKey(6))
        wf = WD.build_window_table(f)
        p = jax.random.uniform(jax.random.PRNGKey(7), (16, 3), minval=0.5,
                               maxval=3.0)
        mask = jnp.arange(16) % 2 == 0
        W, a3, ci3, w0 = WD.fetch_window(wf, p)
        n, nx = WD.eval_window(W, ci3 - a3, w0, f.h, mask=mask)
        n_ref, nx_ref = G.eval_grad(f, p, mask)
        np.testing.assert_allclose(n, n_ref, atol=ATOL)
        np.testing.assert_allclose(nx, nx_ref, atol=ATOL)


class TestWindowScatter:
    def test_scatter_fold_matches_cell_path(self):
        f = rand_field(jax.random.PRNGKey(8))
        wf = WD.build_window_table(f)
        cf = CT.build_cell_table(f)
        span = (f.data.shape[0] - 1) * f.h
        p = jax.random.uniform(jax.random.PRNGKey(9), (64, 3),
                               minval=-0.2 * span, maxval=1.2 * span)
        val = jax.random.normal(jax.random.PRNGKey(10), (64,))
        grad = jax.random.normal(jax.random.PRNGKey(11), (64, 3))

        rows = CT.splat_rows(
            CT.fetch(cf, p)[1], val, grad, f.h)
        ci_flat, w0 = CT.cell_index(cf, p)
        g_ref = CT.fold_cell_grad(
            CT.scatter_rows(CT.zero_cell_grad(cf), ci_flat, rows), cf)

        W, a3, ci3, w0b = WD.fetch_window(wf, p)
        np.testing.assert_allclose(w0b, w0, atol=ATOL)
        _, _, pat = WD.eval_window(W, ci3 - a3, w0b, f.h,
                                   want_patterns=True)
        cw = WD.window_contrib(pat, val, grad, f.h)
        g = WD.fold_window_grad(
            WD.scatter_window(WD.zero_window_grad(wf, cw.dtype),
                              WD.anchor_row(wf, ci3)[1], cw), wf)
        np.testing.assert_allclose(g, g_ref, atol=ATOL)

    def test_pair_combined_scatter(self):
        """Two substep contributions through ONE anchored row must equal two
        independent cell-path splats."""
        f = rand_field(jax.random.PRNGKey(20))
        cf = CT.build_cell_table(f)
        wf = WD.build_window_table(f)
        span = (f.data.shape[0] - 1) * f.h
        p1 = jax.random.uniform(jax.random.PRNGKey(21), (64, 3), minval=0.0,
                                maxval=span)
        delta = jax.random.uniform(jax.random.PRNGKey(22), (64, 3),
                                   minval=-f.h, maxval=f.h)
        p2 = p1 + delta
        vals = [jax.random.normal(jax.random.PRNGKey(23 + i), (64,))
                for i in range(2)]
        grads = [jax.random.normal(jax.random.PRNGKey(25 + i), (64, 3))
                 for i in range(2)]

        g_ref = 0.0
        for p, val, grad in zip([p1, p2], vals, grads):
            rows = CT.splat_rows(CT.fetch(cf, p)[1], val, grad, f.h)
            ci_flat, _ = CT.cell_index(cf, p)
            g_ref = g_ref + CT.fold_cell_grad(
                CT.scatter_rows(CT.zero_cell_grad(cf), ci_flat, rows), cf)

        W, a3, ci3, w0_1 = WD.fetch_window(wf, p1)
        row = WD.anchor_row(wf, ci3)[1]
        ci3_2, w0_2 = WD.cell_index3(wf, p2)
        cw = 0.0
        for ci, w0, val, grad in zip([ci3, ci3_2], [w0_1, w0_2], vals,
                                     grads):
            _, _, pat = WD.eval_window(W, ci - a3, w0, f.h,
                                       want_patterns=True)
            cw = cw + WD.window_contrib(pat, val, grad, f.h)
        g = WD.fold_window_grad(
            WD.scatter_window(WD.zero_window_grad(wf, jnp.float64), row,
                              cw), wf)
        np.testing.assert_allclose(g, g_ref, atol=ATOL)


def _steps(res, h, ds):
    return E.max_steps_fwd(res, h, ds), E.max_steps_bwd(res, h, ds)


class TestPairedTracers:
    def setup_method(self):
        self.res, self.h = 9, 1.0
        self.rif = bump_field(self.res, self.h)
        self.field = G.GridField(self.rif, self.h)
        self.x, self.v = entry_rays(24, self.res, self.h)
        self.ds = self.h / 2

    def test_trace_matches_fast(self):
        sf, _ = _steps(self.res, self.h, self.ds)
        xt_r, vt_r = F.trace(self.field, self.x, self.v, self.ds, sf)
        xt, vt = PD.trace(self.field, self.x, self.v, self.ds, sf)
        np.testing.assert_allclose(xt, xt_r, atol=ATOL)
        np.testing.assert_allclose(vt, vt_r, atol=ATOL)

    def test_trace_odd_max_steps(self):
        """valid_b masking: an odd step budget must match the classic loop."""
        for ms in (7, 13):
            xt_r, vt_r = F.trace(self.field, self.x, self.v, self.ds, ms)
            xt, vt = PD.trace(self.field, self.x, self.v, self.ds, ms)
            np.testing.assert_allclose(xt, xt_r, atol=ATOL)
            np.testing.assert_allclose(vt, vt_r, atol=ATOL)

    def test_trace_plane_matches(self):
        sf, _ = _steps(self.res, self.h, self.ds)
        span = (self.res - 1) * self.h
        po = jnp.tile(jnp.array([[0.0, 1.5 * span, 0.0]]), (24, 1))
        pd = jnp.tile(jnp.array([[0.0, 1.0, 0.0]]), (24, 1))
        out_r = F.trace_plane(self.field, self.x, self.v, po, pd, self.ds, sf)
        out = PD.trace_plane(self.field, self.x, self.v, po, pd, self.ds, sf)
        for a, b in zip(out, out_r):
            np.testing.assert_allclose(a, b, atol=ATOL)

    def test_trace_target_matches(self):
        sf, _ = _steps(self.res, self.h, self.ds)
        span = (self.res - 1) * self.h
        tgt = jnp.tile(jnp.array([[span / 2, 1.2 * span, span / 2]]), (24, 1))
        out_r = F.trace_target(self.field, self.x, self.v, tgt, self.ds, sf)
        out = PD.trace_target(self.field, self.x, self.v, tgt, self.ds, sf)
        for a, b in zip(out, out_r):
            np.testing.assert_allclose(a, b, atol=ATOL)

    def test_trace_sdf_matches(self):
        span = (self.res - 1) * self.h
        idx = jnp.arange(self.res, dtype=self.rif.dtype) * self.h
        z, y, x = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = span / 2
        sdf = jnp.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) - 0.45 * span
        steps = int(2.0 * self.h * self.res / self.ds)
        # spawn strictly inside the sphere
        x0 = jnp.tile(jnp.array([[c, c, c]]), (8, 1)) + 0.1 * self.v[:8]
        out_r = F.trace_sdf(self.field, G.GridField(sdf, self.h), x0,
                            self.v[:8], self.ds, steps)
        out = PD.trace_sdf(self.field, G.GridField(sdf, self.h), x0,
                           self.v[:8], self.ds, steps)
        for a, b in zip(out, out_r):
            np.testing.assert_allclose(a, b, atol=ATOL)

    def test_backtrace_matches_fast(self):
        sf, sb = _steps(self.res, self.h, self.ds)
        xt, vt = F.trace(self.field, self.x, self.v, self.ds, sf)
        key = jax.random.PRNGKey(12)
        dxt = jax.random.normal(key, xt.shape, xt.dtype)
        dvt = jax.random.normal(jax.random.PRNGKey(13), vt.shape, vt.dtype)
        g_ref = F.backtrace(self.field, xt, vt, dxt, dvt, self.ds, sb)
        g = PD.backtrace(self.field, xt, vt, dxt, dvt, self.ds, sb)
        np.testing.assert_allclose(g, g_ref, atol=1e-10)

    def test_backtrace_odd_max_steps(self):
        sf, _ = _steps(self.res, self.h, self.ds)
        xt, vt = F.trace(self.field, self.x, self.v, self.ds, sf)
        dxt = jnp.ones_like(xt)
        dvt = jnp.ones_like(vt)
        for ms in (9, 15):
            g_ref = F.backtrace(self.field, xt, vt, dxt, dvt, self.ds, ms)
            g = PD.backtrace(self.field, xt, vt, dxt, dvt, self.ds, ms)
            np.testing.assert_allclose(g, g_ref, atol=1e-10)


class TestApiSelection:
    def test_auto_selects_paired_for_small_ds(self):
        rif = bump_field(9, 1.0, dtype=jnp.float32)  # max n = 1.1
        assert api._impl(rif, 1.0, 0.5) is PD
        # concrete field: gate is ds * max(n) <= h, so 0.75 * 1.1 still fits
        assert api._impl(rif, 1.0, 0.75) is PD
        assert api._impl(rif, 1.0, 0.95) is F  # 0.95 * 1.1 > h

    def test_auto_under_jit_uses_physical_bound(self):
        # traced rif: falls back to the n <= 2 physical bound, ds <= h/2
        picked = []

        @jax.jit
        def probe(r):
            picked.append(api._impl(r, 1.0, 0.75))
            picked.append(api._impl(r, 1.0, 0.5))
            return r

        probe(bump_field(9, 1.0, dtype=jnp.float32))
        assert picked[0] is F and picked[1] is PD

    def test_violation_poisons_nan(self):
        # force the paired path with a field whose max n breaks ds*n <= h:
        # active rays must come back NaN, not silently wrong
        res, h = 9, 1.0
        rif = bump_field(res, h, amp=2.5, dtype=jnp.float64)  # max n = 3.5
        x, v = entry_rays(8, res, h)
        v = v * 3.5  # |v| = n on entry
        ds = h / 2  # passes the jit-time gate, violates ds * n <= h
        sf, _ = _steps(res, h, ds)
        xt, _ = PD.trace(G.GridField(rif, h), x, v, ds, sf)
        assert bool(jnp.any(jnp.isnan(xt)))

    def test_env_override(self, monkeypatch):
        rif = bump_field(9, 1.0, dtype=jnp.float32)
        monkeypatch.setenv("ANRT_FAST_PATH", "classic")
        assert api._impl(rif, 1.0, 0.5) is F
        monkeypatch.setenv("ANRT_FAST_PATH", "paired")
        assert api._impl(rif, 1.0, 0.75) is PD

    def test_memory_gate(self, monkeypatch):
        rif = bump_field(17, 1.0, dtype=jnp.float32)
        monkeypatch.setenv("ANRT_WINDOW_MEM_MB", "0")
        assert api._impl(rif, 1.0, 0.5) is F

    def test_grad_through_api_matches_ad(self):
        """End-to-end: custom_vjp (paired adjoint) vs autodiff-through-scan."""
        res, h = 9, 1.0
        rif = bump_field(res, h)
        x, v = entry_rays(16, res, h)
        ds = h / 2
        assert api._impl(rif, h, ds) is PD

        def loss(r, fn):
            xt, vt = fn(r, x, v, h, ds)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        g = jax.grad(lambda r: loss(r, api.trace))(rif)
        g_ad = jax.grad(lambda r: loss(r, api.trace_ad))(rif)
        np.testing.assert_allclose(g, g_ad, atol=5e-7)

"""Exit-step compaction: bucketed trace must be exactly plain trace."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjointnonlinearraytracing_tpu import tracer
from adjointnonlinearraytracing_tpu.tracer import compaction


def _spread_case(res=17, n=96, span=4.0, seed=3):
    rng = np.random.default_rng(seed)
    x = np.stack([rng.uniform(0, span, n), np.full(n, -1e-3),
                  rng.uniform(0, span, n)], axis=1)
    pitch = rng.uniform(0.05, 1.0, n)
    yaw = rng.uniform(0, 2 * np.pi, n)
    horiz = np.sqrt(1 - pitch ** 2)
    v = np.stack([horiz * np.cos(yaw), pitch, horiz * np.sin(yaw)], axis=1)
    idx = np.arange(res) * (span / (res - 1))
    z, y, xx = np.meshgrid(idx, idx, idx, indexing="ij")
    c = span / 2
    rif = 1.0 + 0.1 * np.exp(-((xx - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
                             / (span / 3) ** 2)
    return (jnp.asarray(rif), jnp.asarray(x), jnp.asarray(v),
            span / (res - 1))


class TestChordSteps:
    def test_through_center_and_miss(self):
        rif, _, _, h = _spread_case()
        span = (rif.shape[0] - 1) * h
        ds = h / 2
        x = jnp.asarray([[span / 2, -1.0, span / 2],   # straight through
                         [span * 10, -1.0, span / 2]])  # misses the box
        v = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        steps = compaction.chord_steps(rif.shape, h, x, v, ds)
        assert abs(float(steps[0]) - span / ds) < 3
        assert float(steps[1]) == 0.0

    def test_spread_statistic(self):
        rif, x, v, h = _spread_case()
        assert compaction.chord_spread(rif.shape, h, x, v, h / 2) >= 2.0


class TestBucketedExactness:
    @pytest.mark.parametrize("k", [2, 4])
    def test_outputs_match_trace(self, k):
        rif, x, v, h = _spread_case()
        ds = h / 2
        xt0, vt0 = tracer.trace(rif, x, v, h, ds)
        xt1, vt1 = compaction.trace_bucketed(rif, x, v, h, ds, nbuckets=k)
        np.testing.assert_allclose(xt1, xt0, rtol=0, atol=0)
        np.testing.assert_allclose(vt1, vt0, rtol=0, atol=0)

    def test_gradients_match_trace(self):
        rif, x, v, h = _spread_case()
        ds = h / 2

        def loss_plain(r):
            xt, vt = tracer.trace(r, x, v, h, ds)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        def loss_bucketed(r):
            xt, vt = compaction.trace_bucketed(r, x, v, h, ds, nbuckets=4)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        g0 = jax.grad(loss_plain)(rif)
        g1 = jax.grad(loss_bucketed)(rif)
        np.testing.assert_allclose(g1, g0, rtol=1e-12, atol=1e-14)

    def test_indivisible_falls_back(self):
        rif, x, v, h = _spread_case(n=97)
        ds = h / 2
        xt0, vt0 = tracer.trace(rif, x, v, h, ds)
        xt1, vt1 = compaction.trace_bucketed(rif, x, v, h, ds, nbuckets=4)
        np.testing.assert_allclose(xt1, xt0, atol=0)

    def test_driver_flag_wires_bucketing(self, monkeypatch):
        # experiments/common.make_trace honors ANRT_BUCKETED=<k> (opt-in
        # compaction for rig-style sources) with identical outputs/gradients
        from adjointnonlinearraytracing_tpu.experiments import common
        rif, x, v, h = _spread_case()
        span = (rif.shape[0] - 1) * h
        ds = h / 2
        monkeypatch.setenv("ANRT_BUCKETED", "4")
        tr = common.make_trace(span, ds)

        def loss(r):
            xt, vt = tr(r, x, v)
            return jnp.sum(xt ** 2) + jnp.sum(xt * vt)

        g1 = jax.grad(loss)(rif)
        # forward outputs must be computed while the flag is set: make_trace
        # reads ANRT_BUCKETED at call time (ADVICE r3)
        xt1, vt1 = tr(rif, x, v)
        monkeypatch.delenv("ANRT_BUCKETED")
        xt0, vt0 = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt1, xt0, atol=0)
        np.testing.assert_allclose(vt1, vt0, atol=0)
        g0 = jax.grad(lambda r: jnp.sum(tracer.trace(r, x, v, h, ds)[0] ** 2)
                      + jnp.sum(tracer.trace(r, x, v, h, ds)[0]
                                * tracer.trace(r, x, v, h, ds)[1]))(rif)
        np.testing.assert_allclose(g1, g0, rtol=1e-12, atol=1e-14)

    def test_jits(self):
        rif, x, v, h = _spread_case()
        ds = h / 2

        @jax.jit
        def f(r):
            return compaction.trace_bucketed(r, x, v, h, ds, nbuckets=4)

        xt, vt = f(rif)
        xt0, vt0 = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt, xt0, atol=0)


class TestAutoBuckets:
    """VERDICT r4 #8: compaction defaults ON for spread-chord sources."""

    def test_spread_source_autoselects(self):
        rif, x, v, h = _spread_case()
        span = (rif.shape[0] - 1) * h
        assert compaction.auto_buckets(span, x, v, h / 2) == 4

    def test_uniform_source_stays_off(self):
        # parallel upward rays through the volume: uniform chords
        n = 64
        rng = np.random.default_rng(1)
        span = 4.0
        x = jnp.asarray(np.stack([rng.uniform(1, 3, n), np.full(n, -1e-3),
                                  rng.uniform(1, 3, n)], axis=1))
        v = jnp.asarray(np.tile([[0.0, 1.0, 0.0]], (n, 1)))
        assert compaction.auto_buckets(span, x, v, span / 16 / 2) == 0

    def test_make_trace_probe_rays_default(self, monkeypatch):
        """probe_rays turns bucketing on by default for spread sources, env
        still overrides both ways, and outputs stay exact."""
        rif, x, v, h = _spread_case()
        span = (rif.shape[0] - 1) * h
        ds = h / 2
        monkeypatch.delenv("ANRT_BUCKETED", raising=False)
        tr = __import__(
            "adjointnonlinearraytracing_tpu.experiments.common",
            fromlist=["common"]).make_trace(span, ds, probe_rays=(x, v))
        xt, vt = tr(rif, x, v)
        ref = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt, ref[0], atol=1e-12)
        # env override forces OFF
        monkeypatch.setenv("ANRT_BUCKETED", "0")
        tr0 = __import__(
            "adjointnonlinearraytracing_tpu.experiments.common",
            fromlist=["common"]).make_trace(span, ds, probe_rays=(x, v))
        xt0, _ = tr0(rif, x, v)
        np.testing.assert_allclose(xt0, ref[0], atol=1e-12)


class TestShardedBucketed:
    """Per-shard compaction inside shard_map (VERDICT r3 #5): outputs and
    gradients must equal both the unbucketed sharded path and the
    single-device tracer."""

    def test_sharded_bucketed_exact(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace)

        rif, x, v, h = _spread_case(n=64)  # 8 rays/shard, 4 buckets of 2
        ds = h / 2
        mesh = make_ray_mesh()
        f0 = make_sharded_trace(mesh, h, ds, rif.shape[0])
        f4 = make_sharded_trace(mesh, h, ds, rif.shape[0], nbuckets=4)

        xt0, vt0 = f0(rif, x, v)
        xt4, vt4 = f4(rif, x, v)
        np.testing.assert_allclose(xt4, xt0, atol=0)
        np.testing.assert_allclose(vt4, vt0, atol=0)
        xt, vt = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt4, xt, atol=1e-12)

        def loss(fn):
            def g(r):
                a, b = fn(r, x, v)
                return jnp.sum(a ** 2) + jnp.sum(a * b)
            return g

        g0 = jax.grad(loss(f0))(rif)
        g4 = jax.grad(loss(f4))(rif)
        np.testing.assert_allclose(g4, g0, rtol=1e-12, atol=1e-14)

    def test_indivisible_shard_falls_back(self):
        from adjointnonlinearraytracing_tpu.parallel.mesh import (
            make_ray_mesh, make_sharded_trace)

        rif, x, v, h = _spread_case(n=24)  # 3 rays/shard: not divisible by 4
        ds = h / 2
        mesh = make_ray_mesh()
        f4 = make_sharded_trace(mesh, h, ds, rif.shape[0], nbuckets=4)
        xt4, vt4 = f4(rif, x, v)
        xt, vt = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt4, xt, atol=1e-12)

    def test_driver_mesh_flag(self, monkeypatch):
        # ANRT_BUCKETED now composes with mesh=True (experiments/common.py)
        from adjointnonlinearraytracing_tpu.experiments import common

        rif, x, v, h = _spread_case(n=64)
        span = (rif.shape[0] - 1) * h
        ds = h / 2
        monkeypatch.setenv("ANRT_BUCKETED", "4")
        tr = common.make_trace(span, ds, use_mesh=True)
        xt1, vt1 = tr(rif, x, v)
        g1 = jax.grad(lambda r: jnp.sum(tr(r, x, v)[0] ** 2))(rif)
        monkeypatch.delenv("ANRT_BUCKETED")
        xt0, vt0 = tracer.trace(rif, x, v, h, ds)
        np.testing.assert_allclose(xt1, xt0, atol=1e-12)
        g0 = jax.grad(lambda r: jnp.sum(
            tracer.trace(r, x, v, h, ds)[0] ** 2))(rif)
        np.testing.assert_allclose(g1, g0, rtol=1e-10, atol=1e-13)

"""Auxiliary subsystem tests: sweeps, distributed helpers, profiling, metrics,
and a golden-value lock on tracer semantics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


class TestSweeps:
    def test_resolution_sweep_runs(self, capsys):
        from adjointnonlinearraytracing_tpu.benchmarks import sweeps

        rows = sweeps.profile_resolution(nrays=128, iters=1, res_list=(9,))
        assert rows[0]["res"] == 9
        assert rows[0]["back_rays_per_s"] > 0

    def test_stepsize_sweep_runs(self):
        from adjointnonlinearraytracing_tpu.benchmarks import sweeps

        rows = sweeps.profile_stepsize(nrays=128, res=9, iters=1,
                                       include_ad=True)
        assert len(rows) == 7
        assert all(r["back_time_s"] > 0 for r in rows)
        assert all(r["ad_time_s"] > 0 for r in rows)


class TestDistributedHelpers:
    def test_process_info_single(self):
        from adjointnonlinearraytracing_tpu.parallel import process_info

        info = process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8

    def test_local_ray_slice(self):
        from adjointnonlinearraytracing_tpu.parallel import local_ray_slice

        lo, hi, n_valid = local_ray_slice(64)
        assert (lo, hi, n_valid) == (0, 64, 64)
        # indivisible counts pad up to the 8-device shard count; the
        # trailing pad rays are masked inactive (test_multihost.py twin)
        lo, hi, n_valid = local_ray_slice(63)
        assert (lo, hi, n_valid) == (0, 64, 63)

    def test_initialize_noop_single(self):
        from adjointnonlinearraytracing_tpu.parallel import initialize

        initialize(num_processes=1)  # must not raise


class TestProfiling:
    def test_timeit_forces(self):
        from adjointnonlinearraytracing_tpu.utils.profiling import timeit

        f = jax.jit(lambda x: x * 2)
        t = timeit(f, jnp.ones(128), iters=2)
        assert t > 0

    def test_metrics_logger(self, tmp_path):
        from adjointnonlinearraytracing_tpu.utils.metrics import MetricsLogger

        path = str(tmp_path / "m.jsonl")
        m = MetricsLogger(path)
        m.log(0, loss=1.5, rays_per_s=1000)
        m.log(1, loss=1.2)
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["loss"] == 1.5
        assert m.last()["step"] == 1


class TestGolden:
    """Lock the tracer's numerical semantics against refactors.

    Golden values computed at f64 on CPU with the validated implementation
    (adjoint == autodiff == finite differences, tests/test_tracer.py).
    """

    def setup_method(self):
        res, h = 7, 1.0
        idx = jnp.arange(res, dtype=jnp.float64) * h
        z, y, x = jnp.meshgrid(idx, idx, idx, indexing="ij")
        c = (res - 1) * h / 2
        r2 = (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
        self.rif = 1.0 + 0.2 * jnp.exp(-r2 / (2 * (1.5) ** 2))
        self.h = h

    def test_exit_state_golden(self):
        from adjointnonlinearraytracing_tpu import tracer

        x = jnp.array([[3.7, -0.5, 2.9], [2.2, -0.5, 3.4]])
        v = jnp.array([[0.0, 1.0, 0.0], [0.05, 1.0, -0.05]])
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        xt, vt = tracer.trace(self.rif, x, v, self.h, 0.25)
        golden_xt = np.array([
            [3.27295074, 6.2269739, 3.1466317],
            [2.91813189, 6.10539974, 2.75963501]])
        golden_vt = np.array([
            [-0.1430458, 1.00129515, 0.04430399],
            [0.19030176, 0.97520123, -0.13636689]])
        got = np.concatenate([np.asarray(xt), np.asarray(vt)], axis=1)
        want = np.concatenate([golden_xt, golden_vt], axis=1)
        if not np.allclose(got, want, atol=1e-6):
            # regenerate helper: fail with the actual values printed
            raise AssertionError(f"golden mismatch; got\n{got!r}")

    def test_gradient_golden_checksum(self):
        from adjointnonlinearraytracing_tpu import tracer

        x = jnp.array([[3.7, -0.5, 2.9]])
        v = jnp.array([[0.0, 1.0, 0.0]])

        def loss(r):
            xt, vt = tracer.trace(r, x, v, self.h, 0.25)
            return jnp.sum(xt ** 2)

        g = jax.grad(loss)(self.rif)
        checksum = float(jnp.sum(g * jnp.arange(g.size).reshape(g.shape)))
        golden = 8602.58073509282  # post boundary-snap fix; == AD-tape value
        assert abs(checksum - golden) < 1e-6, checksum


class TestDeterminism:
    """Voxel-gradient accumulation is deterministic by construction (XLA
    scatter, no atomics) — stronger than the reference's CUDA atomics
    (SURVEY.md section 5)."""

    def test_backtrace_bitwise_deterministic(self):
        from adjointnonlinearraytracing_tpu import tracer
        from tests.test_tracer import bump_field, entry_rays

        rif = bump_field(9, 1.0, amp=0.25)
        x, v = entry_rays(32, 9, 1.0, seed=5)

        def loss(r):
            xt, vt = tracer.trace(r, x, v, 1.0, 0.5)
            return jnp.sum(xt ** 2)

        g1 = jax.jit(jax.grad(loss))(rif)
        g2 = jax.jit(jax.grad(loss))(rif)
        assert bool((np.asarray(g1) == np.asarray(g2)).all())


class TestScaling:
    def test_weak_scaling_runs(self):
        from adjointnonlinearraytracing_tpu.benchmarks import scaling

        rows = scaling.profile_scaling(res=9, rays_per_device=256, iters=1)
        assert rows[0]["devices"] == 1
        assert rows[-1]["devices"] == 8
        assert all(r["rays_per_s"] > 0 for r in rows)

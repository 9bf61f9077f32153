"""End-to-end experiment driver tests at tiny CPU-runnable scale.

Convergence checks mirror the reference's de-facto validation: losses
decrease under multires optimization, the fuel-injection recon approaches its
GT, the fiber profile moves toward sqrt(2 - r^2), the classical path-matrix
baseline independently reconstructs a synthetic volume.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adjointnonlinearraytracing_tpu.experiments import (
    config, fiber, focalstack, fuel_injection, image, luneburg, voxel_scenes)
from adjointnonlinearraytracing_tpu.sources import sources as S


class TestLuneburg:
    def test_loss_decreases(self):
        params = dict(res_list=[5, 9], vol_span=20, spp=1, nbins=12,
                      optim_iters=6, record_iters=1000, lr=1e-2, seed=0)
        eta, hist = luneburg.run_opt(params)
        assert hist[-1] < hist[0] * 0.8
        assert eta.shape == (9, 9, 9)
        assert float(eta.min()) >= 1.0  # clamp projection

    def test_autodiff_toggle(self):
        params = dict(res_list=[5], vol_span=20, spp=1, nbins=8,
                      optim_iters=2, record_iters=1000, lr=1e-2, seed=0,
                      autodiff=True)
        eta, hist = luneburg.run_opt(params)
        assert np.isfinite(hist).all()

    def test_mesh_toggle(self):
        params = dict(res_list=[5], vol_span=20, spp=1, nbins=8,
                      optim_iters=2, record_iters=1000, lr=1e-2, seed=0,
                      mesh=True)
        eta, hist = luneburg.run_opt(params)
        assert np.isfinite(hist).all()


class TestFuelInjection:
    def test_recovers_synthetic(self):
        gt = voxel_scenes.gaussian_bump(9, 1.0, amp=0.003)
        params = dict(res_list=[5, 9], vol_span=1.0, spp=1, nviews=4,
                      nbins=10, optim_iters=12, record_iters=1000, lr=2e-3,
                      fuel_val=0.003, seed=0)
        eta, hist, _ = fuel_injection.run_opt(params, gtruth=gt)
        assert hist[-1] < hist[0] * 0.5
        err = fuel_injection.reconstruction_error(eta, gt)
        assert np.isfinite(err["rel_norm"])

    def test_real_volume_loads(self):
        gt = voxel_scenes.fuel_injection_rif()
        assert gt.shape == (65, 65, 65)
        assert 0.999 <= float(gt.min()) and float(gt.max()) <= 1.001


class TestImage:
    def test_loss_decreases(self):
        tgt = S.sum_norm(jnp.ones((8, 8)))
        params = dict(disp_ims=[tgt], res_list=[5, 9], vol_span=10, spp=1,
                      nbins=8, optim_iters=4, lr=5e-3, seed=0)
        eta, hist = image.multires_exp(params)
        assert hist[-1] <= hist[0]

    def test_quality_levers(self):
        """per_view_norm + pyramid MSE (round-4 loss levers) run and the
        scale-matched loss is scale-invariant in the rendered image."""
        from adjointnonlinearraytracing_tpu.experiments.image import (
            make_image_mse)
        mse = make_image_mse(per_view_norm=True, pyramid_levels=3)
        key = jax.random.PRNGKey(0)
        im = jax.random.uniform(key, (16, 16)) + 0.5
        meas = jax.random.uniform(jax.random.PRNGKey(1), (16, 16)) + 0.5
        a = mse(im, meas)
        b = mse(3.7 * im, meas)
        np.testing.assert_allclose(a, b, rtol=1e-5)
        # and the full driver runs with the levers on
        tgt = S.sum_norm(jnp.ones((8, 8)))
        params = dict(disp_ims=[tgt], res_list=[5, 9], vol_span=10, spp=1,
                      nbins=8, optim_iters=4, lr=5e-3, seed=0,
                      per_view_norm=True, pyramid_levels=3)
        eta, hist = image.multires_exp(params)
        assert np.isfinite(hist).all()
        assert hist[-1] <= hist[0]

    def test_two_view(self):
        t1 = S.sum_norm(jnp.ones((6, 6)))
        t2 = S.sum_norm(1.0 + jnp.linspace(0, 1, 36).reshape(6, 6))
        params = dict(disp_ims=[t1, t2], res_list=[5], vol_span=10, spp=1,
                      nbins=6, optim_iters=2, lr=1e-3, seed=0)
        eta, hist = image.multires_exp(params)
        assert np.isfinite(hist).all()


class TestFiber:
    def test_loss_decreases(self):
        params = dict(res_list=[5, 9], cable_length=5.0, cable_radius=1.0,
                      camera_span=0.1, sensor_distance=1.57,
                      hop_distance=3.14, nbins=6, spp=1, optim_iters=6,
                      record_iters=1000, lr=1e-2, seed=0)
        n, hist = fiber.multires_exp(params)
        assert n.shape == (9,)
        assert hist[-1] < hist[0]

    def test_moves_toward_ground_truth(self):
        gt = fiber.ground_truth(9)
        params = dict(res_list=[9], cable_length=5.0, cable_radius=1.0,
                      camera_span=0.1, sensor_distance=1.57,
                      hop_distance=3.14, nbins=8, spp=1, optim_iters=25,
                      record_iters=1000, lr=2e-2, seed=0)
        n, hist = fiber.multires_exp(params)
        # closer to the GT profile than the flat start
        d_start = float(jnp.abs(jnp.ones(9) - gt).mean())
        d_end = float(jnp.abs(n - gt).mean())
        assert d_end < d_start

    def test_init_profile_refinement(self):
        """init_profile starts the run from a saved profile (the reference's
        init_scene refinement workflow, params-fiber.yaml:39-55)."""
        start = jnp.linspace(1.35, 1.0, 9)
        params = dict(res_list=[9], init_profile=start, cable_length=5.0,
                      cable_radius=1.0, camera_span=0.1,
                      sensor_distance=1.57, hop_distance=3.14, nbins=6,
                      spp=1, optim_iters=2, record_iters=1000, lr=1e-4,
                      seed=0, grad_spotcheck=False)
        n, _ = fiber.multires_exp(params)
        # tiny lr, 2 iters: must stay near the provided init, not the flat 1s
        assert float(jnp.abs(n - start).max()) < 0.01
        assert float(jnp.abs(n - jnp.ones(9)).max()) > 0.1

    def test_default_params_projection(self):
        """projected_step inherits True from the reference YAML default
        section (params-fiber.yaml:34) — regression for the divergence on
        long stages."""
        assert fiber.default_params()["projected_step"] is True


class TestFocalStack:
    def test_loss_decreases(self):
        scene = voxel_scenes.gaussian_bump(9, 10.0, amp=0.2)
        src_im = jnp.ones((8, 8))
        p = dict(res_list=[5, 9], vol_span=10.0, spp=1, nbins=8,
                 optim_iters=4, sensor_dists=[1.0, 3.0], source_image=src_im,
                 source_type="cone", lr=2e-3, seed=0)
        p["focal_stack"] = focalstack.make_synthetic_stack(scene, p)
        eta, hist = focalstack.multires_exp(p)
        assert hist[-1] < hist[0]


class TestPathMatrix:
    def test_reconstruction(self):
        from adjointnonlinearraytracing_tpu.pathmatrix import fuel_reconstruction

        gt = voxel_scenes.gaussian_bump(17, 1.0, amp=0.0005).astype(jnp.float64)
        recon, rep = fuel_reconstruction(
            gt, dict(nviews=16, nbins=24, spp=2, int_res=100))
        assert rep["rel_err_norm"] < 0.5
        assert rep["num_rays"] > 0

    def test_path_matrix_row_sums(self):
        """Per-ray path lengths through the grid sum to the chord length."""
        from adjointnonlinearraytracing_tpu.pathmatrix import path_matrix as PM

        sp = np.array([[0.05, 0.5, 0.5], [0.5, 0.05, 0.5]])
        ep = np.array([[0.95, 0.5, 0.5], [0.5, 0.95, 0.5]])
        v = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        phi = PM.construct_voxel_matrix(sp, v, ep, v, 1.0, 8,
                                        spline="linear", int_res=64)
        rowsum = np.asarray(phi.sum(axis=1)).ravel()
        np.testing.assert_allclose(rowsum, 0.9, rtol=1e-6)

    def test_diff_matrices(self):
        from adjointnonlinearraytracing_tpu.pathmatrix import path_matrix as PM

        diffs = PM.construct_diff_matrices(4, 1.0, 3)
        assert len(diffs) == 3
        # a linear ramp in x has constant finite difference along axis 0
        x = np.arange(4)
        vol = np.tile(x, (4, 4, 1)).transpose(2, 1, 0)  # vol[ix,iy,iz] = ix
        flat = vol.reshape(-1, order="F")
        g = diffs[0] @ flat
        box = 1.0 / 4
        inner = g[np.abs(g) > 1e-12]
        np.testing.assert_allclose(inner, 1.0 / box, rtol=1e-9)


class TestConfig:
    def test_default_override(self, tmp_path):
        y = tmp_path / "p.yaml"
        y.write_text("""
default:
  lr: 0.1
  res_list: [3, 5]
  nested:
    a: 1
    b: 2
exp1:
  lr: 0.5
  nested:
    b: 3
""")
        p = config.load_params(str(y), "exp1")
        assert p["lr"] == 0.5
        assert p["res_list"] == [3, 5]
        assert p["nested"] == {"a": 1, "b": 3}
        assert p["exp_name"] == "exp1"
        assert config.experiment_names(str(y)) == ["exp1"]

    def test_reference_yaml_schema(self, tmp_path):
        """The shipped reference YAML schema (default + named sections) loads."""
        y = tmp_path / "params-fiber.yaml"
        y.write_text("""
default:
  res_list: [3, 5, 9]
  lr: 0.0001
  autodiff: False
hop2opt-lr1e-2-uniinit:
  sensor_distance: 1.57
  lr: 0.01
""")
        p = config.load_params(str(y), "hop2opt-lr1e-2-uniinit")
        assert p["lr"] == 0.01
        assert p["autodiff"] is False

    def test_runner_lkfs_synthetic_source_image(self, tmp_path):
        """The shipped focal-stack YAML's documented command runs end-to-end.

        Regression for the ADVICE r2 finding: the lkfs* sections carry
        ``source_image: true`` (use the in-focus capture as the emission
        image); with the captures absent the synthetic branch must replace
        the bool with a real image, not let ``True`` flow into
        ``get_sdf_vals_near`` (AttributeError on ``True.shape``).
        """
        from adjointnonlinearraytracing_tpu.experiments import runner

        runner.main([
            "configs/params-focalstack.yaml",
            "lkfs10_3im_srciminfocus_cone1_dist2",
            "--result-dir", str(tmp_path / "fs"),
            "--set", "res_list=[3, 5]", "--set", "optim_iters=1",
            "--set", "nbins=8", "--set", "spp=1",
        ])
        assert (tmp_path / "fs" / "metrics.jsonl").exists()


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        import optax
        from adjointnonlinearraytracing_tpu.opt import (
            load_checkpoint, save_checkpoint)

        n = jnp.arange(8.0).reshape(2, 2, 2)
        opt = optax.adam(1e-3)
        state = opt.init(n)
        # take one update so moments are non-trivial
        g = jnp.ones_like(n)
        _, state = opt.update(g, state, n)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, n, state, [1.0, 0.5], jax.random.PRNGKey(3))
        n2, opt2, state2, hist, key = load_checkpoint(path, 1e-3)
        np.testing.assert_allclose(n2, n)
        assert hist == [1.0, 0.5]

    def test_stat_fn_receives_every_step(self):
        from adjointnonlinearraytracing_tpu.opt import multires_opt

        seen = []
        n, hist = multires_opt(
            lambda n, key: jnp.sum((n - 2.0) ** 2), jnp.ones((3, 3, 3)),
            iterations=2, res_list=[3, 5], lr=1e-2,
            stat_fn=lambda it, loss, secs: seen.append((it, loss, secs)))
        assert len(seen) == len(hist) == 2 * 1 + 2 * 2
        assert [s[0] for s in seen] == list(range(6))
        np.testing.assert_allclose([s[1] for s in seen], hist)
        assert all(s[2] >= 0 for s in seen)

    def test_midstage_checkpoint_cadence(self, tmp_path, monkeypatch):
        # wall-clock-bounded runs (chip queue `timeout`) keep partial-stage
        # progress: with ANRT_CKPT_SECS=0.0001 every iteration checkpoints,
        # so the saved history can end mid-stage, and resume continues from
        # it rather than the last stage boundary
        from adjointnonlinearraytracing_tpu.opt import (
            load_checkpoint, multires_opt)

        monkeypatch.setenv("ANRT_CKPT_SECS", "0.0001")
        path = str(tmp_path / "ckpt")
        n, hist = multires_opt(
            lambda n, key: jnp.sum((n - 2.0) ** 2), jnp.ones((3, 3, 3)),
            iterations=3, res_list=[3, 5], lr=1e-2, statename=path)
        monkeypatch.delenv("ANRT_CKPT_SECS")
        n2, _, _, hist2, _ = load_checkpoint(path, 1e-2)
        assert list(hist2) == list(hist)  # saved through the last iteration
        np.testing.assert_allclose(n2, n)
        n3, hist3 = multires_opt(
            lambda n, key: jnp.sum((n - 2.0) ** 2), jnp.ones((3, 3, 3)),
            iterations=3, res_list=[3, 5], lr=1e-2, resume_from=path)
        assert len(hist3) > len(hist)  # continued, not restarted
        assert float(hist3[-1]) <= float(hist[-1]) + 1e-6

    def test_orbax_backend_roundtrip(self, tmp_path):
        import optax
        from adjointnonlinearraytracing_tpu.opt import (
            load_checkpoint, save_checkpoint)

        n = jnp.arange(8.0).reshape(2, 2, 2)
        opt = optax.adam(1e-3)
        state = opt.init(n)
        g = jnp.ones_like(n)
        _, state = opt.update(g, state, n)
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, n, state, [1.0, 0.5], jax.random.PRNGKey(3),
                        backend="orbax")
        n2, opt2, state2, hist, key = load_checkpoint(path, 1e-3)
        np.testing.assert_allclose(n2, n)
        np.testing.assert_allclose(np.asarray(hist), [1.0, 0.5])
        from adjointnonlinearraytracing_tpu.opt.multires import \
            _find_adam_state
        _, a1 = _find_adam_state(state)
        _, a2 = _find_adam_state(state2)
        np.testing.assert_allclose(a2.mu, a1.mu)
        np.testing.assert_allclose(a2.nu, a1.nu)

    def test_moment_upsampling(self):
        import optax
        from adjointnonlinearraytracing_tpu.opt import upres_adam_state

        state = optax.ScaleByAdamState(
            count=jnp.asarray(5),
            mu=jnp.ones((3, 3, 3)),
            nu=2 * jnp.ones((3, 3, 3)))
        up = upres_adam_state(state, 5)
        assert up.mu.shape == (5, 5, 5)
        np.testing.assert_allclose(up.mu, 1.0, atol=1e-6)
        np.testing.assert_allclose(up.nu, 2.0, atol=1e-6)
        assert int(up.count) == 5


class TestResume:
    def test_multires_resume_continues(self, tmp_path):
        """Kill-and-resume: the second half continues from the checkpoint."""
        from adjointnonlinearraytracing_tpu.opt import multires_opt
        from adjointnonlinearraytracing_tpu import tracer
        from tests.test_tracer import bump_field, entry_rays

        x, v = entry_rays(16, 9, 1.0, seed=9)
        target = jnp.array([4.0, 10.0, 4.0])

        def loss_fn(n, key):
            h = 8.0 / (n.shape[0] - 1)
            xt, vt = tracer.trace(n, x, v, h, 0.5)
            return jnp.sum((xt - target) ** 2) / 16

        ck = str(tmp_path / "ck")
        n1, h1 = multires_opt(loss_fn, jnp.ones((5, 5, 5)), 3, [5, 9],
                              lr=1e-2, statename=ck)
        # resume from the stage-2 checkpoint; should skip stage 1 (res 5)
        n2, h2 = multires_opt(loss_fn, jnp.ones((5, 5, 5)), 3, [5, 9],
                              lr=1e-2, resume_from=ck + ".npz")
        assert n2.shape == (9, 9, 9)
        assert len(h2) > len(h1)
        assert np.isfinite(h2).all()


class TestImageSdfLoss:
    def test_sdf_texture_loss_mode(self):
        """image_opt's sdf_loss mode (distance textures instead of images)."""
        sdf_tex = jnp.linspace(-1, 1, 64).reshape(8, 8)
        params = dict(sdf_loss=True, sdf_disp=[sdf_tex], disp_ims=[None],
                      res_list=[5], vol_span=10, spp=1, nbins=8,
                      optim_iters=3, lr=1e-3, seed=0)
        eta, hist = image.multires_exp(params)
        assert np.isfinite(hist).all()

    def test_far_field_deflection_loss(self):
        far_tgt = S.sum_norm(jnp.ones((8, 8)))
        params = dict(disp_ims=[None], defl_ims=[far_tgt], defl_weight=0.5,
                      res_list=[5], vol_span=10, spp=1, nbins=8,
                      optim_iters=3, lr=1e-3, seed=0)
        eta, hist = image.multires_exp(params)
        assert np.isfinite(hist).all()

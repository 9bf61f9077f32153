"""Flagship einstein/turing multi-view run (reference image_opt defaults).

Resumable: multires_opt writes a per-stage checkpoint to
results/einstein_turing_128/result.npz; pass --resume to continue a killed
run from the latest stage instead of restarting the ladder.  After the run,
reports the correlation of rendered sensor images against the two targets
(the reference's qualitative figure, core/image_opt.py:157-179, made
quantitative).
"""
import json
import os
import sys

import numpy as np

RESULT_DIR = os.environ.get("IMG_DIR", "results/einstein_turing_r4")


def target_correlation(eta, resolution=128, spp=32, seed=1234):
    """Correlation of freshly rendered sensor images vs the target images."""
    import jax
    import jax.numpy as jnp

    from adjointnonlinearraytracing_tpu.experiments import image
    from adjointnonlinearraytracing_tpu.experiments.voxel_scenes import data_path
    from adjointnonlinearraytracing_tpu.sources import sources as S
    from adjointnonlinearraytracing_tpu import sensors, tracer
    from adjointnonlinearraytracing_tpu.experiments import common

    targets = [S.sum_norm(image.load_image(data_path(p), resolution))
               for p in ("einstein.png", "turing.png")]
    vol_span, step_res = 20, 2
    h = vol_span / (eta.shape[0] - 1)
    ds = (vol_span / 128) / step_res
    rays, rpv = S.rand_rays_in_sphere(
        jax.random.PRNGKey(seed), 2, (resolution, resolution), spp, vol_span,
        sensor_dist=0)
    sensor_p, sensor_n, sensor_t = common.per_view_planes(rays.planes, rpv)
    xm, vm = tracer.trace(eta, rays.x, rays.v, h, ds)
    xmp, vmp = sensors.trace_rays_to_plane(
        (xm, vm), (rays.planes[:, 0, :], rays.planes[:, 1, :]))
    xs = common.split_views(xmp, rpv)
    vs = common.split_views(vmp, rpv)
    ms = common.split_views(rays.mask, rpv)
    def _corr(x, y):
        a = x.ravel() - x.mean()
        b = y.ravel() - y.mean()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    def _pool(x, k):
        n = (x.shape[0] // k) * k
        return x[:n, :n].reshape(n // k, k, n // k, k).mean(axis=(1, 3))

    corr, corr_pooled = [], []
    for xv, vv, sp, sn, st, mk, tgt in zip(
            xs, vs, sensor_p, sensor_n, sensor_t, ms, targets):
        im = S.sum_norm(sensors.generate_sensor(
            (xv, vv), 1.0, (sp, sn), resolution, vol_span, st, mask=mk))
        im = np.asarray(im)
        tgt = np.asarray(tgt)
        corr.append(_corr(im, tgt))
        # 4x-pooled correlation: the structural metric — per-pixel caustic
        # speckle (Monte-Carlo splat noise the eye ignores) dominates the
        # full-resolution correlation of a visually recognizable render
        corr_pooled.append(_corr(_pool(im, 4), _pool(tgt, 4)))
    return corr, corr_pooled


def write_report(eta, hist):
    corr, corr_pooled = target_correlation(eta)
    report = {"first_loss": float(hist[0]), "last_loss": float(hist[-1]),
              "n_iters": len(hist), "stage_res": int(eta.shape[0]),
              "corr_einstein": corr[0], "corr_turing": corr[1],
              "corr4x_einstein": corr_pooled[0],
              "corr4x_turing": corr_pooled[1]}
    with open(f"{RESULT_DIR}/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    from adjointnonlinearraytracing_tpu.experiments import image

    if "--report-only" in sys.argv:
        # Score the latest checkpoint (e.g. after a wall-clock-bounded run
        # was cut mid-ladder) without re-running the optimization.
        from adjointnonlinearraytracing_tpu.opt import load_checkpoint
        eta, _, _, hist, _ = load_checkpoint(f"{RESULT_DIR}/result.npz", 1e-4)
        write_report(eta, hist)
        sys.exit(0)

    res_list = [int(r) for r in
                os.environ.get("IMG_RES_LIST", "3,5,9,17,33,65,129").split(",")]
    resume = "--resume" in sys.argv and os.path.exists(
        f"{RESULT_DIR}/result.npz")
    eta, hist = image.run_multiview_exp(
        result_dir=RESULT_DIR,
        resolution=128,
        optim_iters=int(os.environ.get("IMG_ITERS", "50")),
        res_list=res_list,
        vol_span=20, step_res=2, spp=8, lr=1e-4, seed=0,
        record_iters=int(os.environ.get("IMG_RECORD", "50")),
        resume_from=f"{RESULT_DIR}/result.npz" if resume else None,
        # round-4 quality levers (VERDICT r3 #1): scale-invariant per-view
        # matching + 4-level pyramid MSE; stage-level spotcheck escalates to
        # the checkpointed-exact gradient when adjoint drift exceeds 1e-2
        per_view_norm=os.environ.get("IMG_PVNORM", "1") == "1",
        pyramid_levels=int(os.environ.get("IMG_PYRAMID", "4")),
    )
    write_report(eta, hist)

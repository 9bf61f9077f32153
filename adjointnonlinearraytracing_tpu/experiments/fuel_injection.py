"""Fuel-injection gas tomography (reference: core/fuel_injection_opt.py).

Synthetic tomography: the 64^3 fuel-injection volume (padded to 65^3 and
rescaled to a refractive-index field) is traced once to produce reference
exit rays; the optimization recovers the field by matching plane-projected
exit positions (+ weighted directions) against those references.  This is the
north-star workload of BASELINE.json (128^3 grid, 10M rays/iter when scaled).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import sensors
from ..opt import multires_opt
from ..sources import sources as S
from ..utils.metrics import MetricsLogger
from . import common, voxel_scenes


def default_params() -> Dict:
    return dict(
        res_list=[3, 5, 9, 17, 33, 65],
        vol_span=1.0,
        spp=1,
        nviews=8,
        sensor_distance=0,
        step_res=2,
        optim_iters=300,
        record_iters=30,
        angle_span=360,
        nbins=128,
        lr=1e-4,
        source_type="planar",
        autodiff=False,
        fuel_val=0.0003,
        defl_weight=1.0,
        seed=0,
    )


def run_opt(params: Dict, result_dir: Optional[str] = None, gtruth=None):
    """Main driver (fuel_injection_opt.py:14-126).

    ``gtruth`` overrides the loaded GT volume (used by tests/benchmarks with
    synthetic scenes).  Returns (final_eta, loss_hist, gtruth).
    """
    res_list = params.get("res_list", [3, 5, 9, 17, 33, 65])
    vol_span = params.get("vol_span", 1.0)
    spp = params.get("spp", 1)
    nviews = params.get("nviews", 1)
    sensor_dist = params.get("sensor_distance", 0)
    step_res = params.get("step_res", 2)
    optim_iters = params.get("optim_iters", 300)
    record_iters = params.get("record_iters", 30)
    angle_s = params.get("angle_span", 360)
    nbins = params.get("nbins", 128)
    lr = params.get("lr", 1e-4)
    src_type = params.get("source_type", "planar")
    autodiff = params.get("autodiff", False)
    fuel_val = params.get("fuel_val", 0.0003)
    defl_weight = params.get("defl_weight", 1.0)
    use_mesh = params.get("mesh", False)
    seed = params.get("seed", 0)
    dtype = params.get("dtype", jnp.float32)

    h = vol_span / max(res_list[-1] - 1, 1)
    ds = h / step_res
    # project onto the paired-path precondition n <= h/ds (tracer/api._impl):
    # finest-stage bound; physical peak index is sqrt(2) so this never binds
    # on a healthy run (VERDICT r3 weak #4)
    clamp_max = params.get("clamp_max",
                           float(step_res) if step_res >= 2 else None)
    span = vol_span

    if gtruth is None:
        gtruth = voxel_scenes.fuel_injection_rif(fuel_val, dtype=dtype)

    metrics = MetricsLogger(
        f"{result_dir}/metrics.jsonl" if result_dir else None,
        append=params.get("resume_from") is not None)

    def gen_start_rays(key, samples):
        if src_type == "planar":
            rays, rpv = S.rand_rays_in_sphere(
                key, nviews, (nbins, nbins), samples, span, angle_span=angle_s,
                circle=False, xaxis=False, sensor_dist=sensor_dist)
        elif src_type == "point":
            rays, rpv = S.rand_ptrays_in_sphere(
                key, nviews, (nbins, nbins), samples, span, angle_span=angle_s,
                circle=False, xaxis=False, sensor_dist=sensor_dist)
        else:
            rays, _, _, rpv = S.rand_area_in_sphere(
                key, nviews, (nbins, nbins), samples, span, angle_span=angle_s,
                circle=False, xaxis=False, sensor_dist=sensor_dist)
        rays = S.Rays(rays.x.astype(dtype), rays.v.astype(dtype),
                      rays.planes.astype(dtype), rays.mask)
        return rays, rpv

    grad_holder = {"mode": params.get("gradient")}

    # measurement rays are FIXED across the optimization (fuel_injection_opt
    # traces the GT once, :85-86).  Materialize them to host numpy so the
    # jitted steps embed plain constants instead of holding device buffers
    # (a closed-over device array forces a device->host pull at trace time,
    # which is fragile over remote backends).
    import numpy as _np

    rays, rpv = gen_start_rays(jax.random.PRNGKey(seed), spp)
    trace = common.make_trace(vol_span, ds, autodiff=autodiff, use_mesh=use_mesh,
                              gradient=grad_holder,
                              probe_rays=(rays.x[:4096], rays.v[:4096]))
    x_gt, v_gt = trace(gtruth, rays.x, rays.v)
    x_gt, v_gt = sensors.trace_rays_to_plane(
        (x_gt, v_gt), (rays.planes[:, 0, :], rays.planes[:, 1, :]))
    x_gt = _np.asarray(x_gt)
    v_gt = _np.asarray(v_gt)
    rays = S.Rays(_np.asarray(rays.x), _np.asarray(rays.v),
                  _np.asarray(rays.planes), _np.asarray(rays.mask))

    # optional smoothness prior (VERDICT r4 #6: the control experiment for
    # the "rel_norm 0.271 is the measurement-model floor" claim).  The
    # penalty acts on the signal-scaled deviation e = (eta - 1)/fuel_val so
    # reg_weight is amplitude-independent.  reg='tv' is (smoothed)
    # anisotropic total variation; reg='h1' is the quadratic gradient norm.
    reg_weight = float(params.get("reg_weight", 0.0))
    reg_kind = params.get("reg", "tv")

    def regularizer(eta):
        e = (eta - 1.0) / fuel_val
        dz = e[1:] - e[:-1]
        dy = e[:, 1:] - e[:, :-1]
        dx = e[:, :, 1:] - e[:, :, :-1]
        if reg_kind == "h1":
            return jnp.mean(dz ** 2) + jnp.mean(dy ** 2) + jnp.mean(dx ** 2)
        eps = 1e-6
        return (jnp.mean(jnp.sqrt(dz ** 2 + eps))
                + jnp.mean(jnp.sqrt(dy ** 2 + eps))
                + jnp.mean(jnp.sqrt(dx ** 2 + eps)))

    def loss_function(eta, key):
        xm, vm = trace(eta, rays.x, rays.v)
        sn = rays.planes[:, 1, :]
        sp = rays.planes[:, 0, :]
        xmp, vmp = sensors.trace_rays_to_plane((xm, vm), (sp, sn))
        disp_loss = common.masked_mean_sq(xmp - x_gt, rays.mask) / 3.0
        defl_loss = common.masked_mean_sq(vmp - v_gt, rays.mask) / 3.0
        loss = (disp_loss + defl_weight * defl_loss) / fuel_val
        if reg_weight:
            loss = loss + reg_weight * regularizer(eta)
        return loss

    def log_function(iter_count, eta):
        metrics.log(iter_count, res=eta.shape[0])
        if (result_dir is None or record_iters > 10 ** 8
                or iter_count % record_iters != 0):
            return
        imx = eta[eta.shape[0] // 2, :, :]
        imy = eta[:, eta.shape[1] // 2, :]
        imz = eta[:, :, eta.shape[2] // 2]
        from ..utils.plotting import save_multiple_images
        save_multiple_images([imx, imy, imz],
                             f"{result_dir}/fuel_injection_{iter_count}.png")

    n0 = jnp.ones((res_list[0],) * 3, dtype=dtype) + fuel_val
    if params.get("grad_spotcheck", True) and not autodiff:
        common.gradient_spotcheck(n0, jnp.asarray(rays.x),
                                  jnp.asarray(rays.v), vol_span, ds,
                                  mask=jnp.asarray(rays.mask),
                                  metrics=metrics)
    stage_fn = None
    if (params.get("auto_exact", True) and not autodiff
            and params.get("gradient") is None):
        def _probe_rays():
            return (jnp.asarray(rays.x), jnp.asarray(rays.v),
                    jnp.asarray(rays.mask))
        stage_fn = common.make_stage_escalator(
            grad_holder, vol_span, ds, _probe_rays, metrics,
            rays_per_iter=nbins * nbins * spp * nviews)
    final_eta, loss_hist = multires_opt(
        loss_function, n0, optim_iters, res_list, log_function, lr=lr,
        stage_fn=stage_fn,
        statename=f"{result_dir}/result" if result_dir else None,
        key=jax.random.PRNGKey(seed + 1),
        clamp_max=clamp_max,
        resume_from=params.get("resume_from"))

    if result_dir is not None:
        from ..utils.plotting import save_loss_plot
        save_loss_plot(loss_hist, f"{result_dir}/loss_plot.png")
    return final_eta, loss_hist, gtruth


def reconstruction_error(eta, gtruth, background=1.0):
    """Relative reconstruction error vs the GT volume, both resampled to the
    recovered resolution (run_fuel_injection_2008.py:230-234 analog).

    ``rel_norm`` is signal-relative: ||eta - gt|| / ||gt - background||, so
    1.0 means "as wrong as guessing the uniform background".  For the fuel
    scene pass ``background=1+fuel_val`` (the plume's surround), matching
    the pathmatrix baseline's convention (fuel2008.py).  ``ref_norm`` is the
    reference's own number, norm of the elementwise relative error
    ||(eta-gt)/gt|| (run_fuel_injection_2008.py:231-232).
    """
    from ..fields.grid import upres_volume

    gt = upres_volume(gtruth, eta.shape)
    err = eta - gt
    rel = jnp.linalg.norm(err.reshape(-1)) / jnp.maximum(
        jnp.linalg.norm((gt - background).reshape(-1)), 1e-30)
    return dict(
        rel_norm=float(rel),
        ref_norm=float(jnp.linalg.norm((err / gt).reshape(-1))),
        max_abs=float(jnp.abs(err).max()),
        l1=float(jnp.abs(err).mean()),
    )


if __name__ == "__main__":
    run_opt(default_params(), "results/fuel_injection")

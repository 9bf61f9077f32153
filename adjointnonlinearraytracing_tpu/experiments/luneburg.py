"""Luneburg-lens inverse design (reference: core/luneburg_opt.py).

Random cube-face sources are traced through the volume; the loss is the mean
squared distance of plane-projected exit points from each ray's focal target
(the opposite point on the sensor sphere).  Optimized coarse-to-fine up to
129^3; the converged field approaches the closed-form Luneburg profile
``n(r) = sqrt(2 - (r/R)^2)`` (voxel_scenes.luneburg_lens).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .. import sensors
from ..opt import multires_opt
from ..sources import sources as S
from ..utils.metrics import MetricsLogger
from . import common


def default_params() -> Dict:
    # mirrors run_default_opt (luneburg_opt.py:13-30, syntax-repaired)
    return dict(
        cube_rots=1,
        res_list=[3, 5, 9, 17, 33, 65, 129],
        vol_span=20,
        step_res=2,
        optim_iters=70,
        record_iters=20,
        nbins=128,
        spp=10,
        planar_source="plane",
        sensor_distance=0,
        autodiff=False,
        lr=1e-2,
        seed=0,
    )


def run_opt(params: Dict, result_dir: Optional[str] = None):
    """Main driver (luneburg_opt.py:33-132).  Returns (final_eta, loss_hist)."""
    res_list = params.get("res_list", [3, 5, 9, 17, 33, 65])
    vol_span = params.get("vol_span", res_list[0])
    spp = params.get("spp", 2)
    sensor_dist = params.get("sensor_distance", 0)
    step_res = params.get("step_res", 2)
    optim_iters = params.get("optim_iters", 30)
    record_iters = params.get("record_iters", 30)
    nbins = params.get("nbins", 128)
    lr = params.get("lr", 1e-2)
    plane_src = params.get("planar_source", "plane")
    autodiff = params.get("autodiff", False)
    cube_rots = params.get("cube_rots", 1)
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

    metrics = MetricsLogger(
        f"{result_dir}/metrics.jsonl" if result_dir else None,
        append=params.get("resume_from") is not None)

    def gen_start_rays(key, samples):
        views = []
        keys = jax.random.split(key, 2 * cube_rots)
        for i in range(cube_rots):
            rays, rpv = S.rand_rays_cube(keys[2 * i], (nbins, nbins), samples,
                                         span, circle=True, src_type=plane_src)
            x, v, planes = S.random_rotate_ic(keys[2 * i + 1], rays.x, rays.v,
                                              rays.planes, span)
            views.append(S.Rays(x.astype(dtype), v.astype(dtype),
                                planes.astype(dtype), rays.mask))
        rays, nrays = S._cat_rays(views)
        return rays, nrays

    grad_holder = {"mode": params.get("gradient")}
    _probe, _ = gen_start_rays(jax.random.PRNGKey(
        params.get("seed", 0) + 779), 1)
    trace = common.make_trace(vol_span, ds, autodiff=autodiff, use_mesh=use_mesh,
                              gradient=grad_holder,
                              probe_rays=(_probe.x[:4096], _probe.v[:4096]))

    def loss_function(eta, key):
        rays, _ = gen_start_rays(key, spp)
        xm, vm = trace(eta, rays.x, rays.v)
        sn = rays.planes[:, 1, :]
        sp = rays.planes[:, 0, :] + sensor_dist * sn
        xmp, vmp = sensors.trace_rays_to_plane((xm, vm), (sp, sn))
        # luneburg_opt.py:102: sum over live rays, normalized by count & span
        return common.masked_sum_sq(xmp - sp, rays.mask) \
            / jnp.maximum(rays.mask.sum(), 1) / span

    def log_function(iter_count, eta):
        metrics.log(iter_count, res=eta.shape[0])
        if result_dir is None or record_iters > 10 ** 8:
            return
        if iter_count % record_iters == 0:
            key = jax.random.PRNGKey(seed + 100_000 + iter_count)
            rays, rpv = gen_start_rays(key, spp)
            sensor_p, sensor_n, sensor_t = common.per_view_planes(rays.planes, rpv)
            xm, vm = trace(eta, rays.x, rays.v)
            xs = common.split_views(xm, rpv)
            vs = common.split_views(vm, rpv)
            ms = common.split_views(rays.mask, rpv)
            images = [
                S.sum_norm(sensors.generate_sensor(
                    (xv, vv), 1.0, (sp, sn), nbins, span, st, mask=mk))
                for xv, vv, sp, sn, st, mk in zip(
                    xs, vs, sensor_p, sensor_n, sensor_t, ms)]
            from ..utils.plotting import save_multiple_images
            save_multiple_images(images,
                                 f"{result_dir}/luneburg_{iter_count}.png")

    n0 = jnp.ones((res_list[0],) * 3, dtype=dtype)
    if params.get("grad_spotcheck", True) and not autodiff:
        rays, _ = gen_start_rays(jax.random.PRNGKey(seed + 777), 1)
        common.gradient_spotcheck(n0, rays.x, rays.v, vol_span, ds,
                                  mask=rays.mask, metrics=metrics)
    stage_fn = None
    if (params.get("auto_exact", True) and not autodiff
            and params.get("gradient") is None):
        def _probe_rays():
            r, _ = gen_start_rays(jax.random.PRNGKey(seed + 778), 1)
            return r.x, r.v, r.mask
        stage_fn = common.make_stage_escalator(
            grad_holder, vol_span, ds, _probe_rays, metrics,
            rays_per_iter=nbins * nbins * spp * cube_rots)
    final_eta, loss_hist = multires_opt(
        loss_function, n0, optim_iters, res_list, log_function, lr=lr,
        stage_fn=stage_fn,
        statename=f"{result_dir}/result" if result_dir else None,
        key=jax.random.PRNGKey(seed),
        clamp_max=clamp_max,
        resume_from=params.get("resume_from"))

    if result_dir is not None:
        from ..utils.plotting import save_loss_plot
        save_loss_plot(loss_hist, f"{result_dir}/loss_plot.png")
    return final_eta, loss_hist


if __name__ == "__main__":
    run_opt(default_params(), "results/luneburg")

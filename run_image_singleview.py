"""Single-view control for the einstein/turing flagship analysis (round 4).

Question: is the two-view flagship's correlation ceiling (~0.75/0.52) an
optimization failure or a physics property of the two-view coupling?
Control: optimize the SAME pipeline with ONE target view (einstein).  If a
single view reaches far higher correlation under the identical loss,
gradient, ladder and budget, the ceiling is the two-view null-space
coupling (each caustic constrains the volume the other must share), not
the optimizer.
"""

import json
import os

import numpy as np

RESULT_DIR = os.environ.get("SV_DIR", "results/image_singleview_r4")


def main():
    import jax

    from adjointnonlinearraytracing_tpu import sensors, tracer
    from adjointnonlinearraytracing_tpu.experiments import common, image
    from adjointnonlinearraytracing_tpu.experiments.voxel_scenes import (
        data_path)
    from adjointnonlinearraytracing_tpu.sources import sources as S

    resolution = 128
    einstein = S.sum_norm(image.load_image(data_path("einstein.png"),
                                           resolution))
    res_list = [int(r) for r in
                os.environ.get("SV_RES_LIST", "3,5,9,17,33,65").split(",")]
    params = dict(
        disp_ims=[einstein],
        res_list=res_list,
        optim_iters=int(os.environ.get("SV_ITERS", "30")),
        record_iters=200,
        nbins=resolution,
        vol_span=20, step_res=2, spp=8, lr=1e-4, seed=0,
        per_view_norm=True, pyramid_levels=4,
    )
    eta, hist = image.multires_exp(params, RESULT_DIR)

    # correlation of a fresh single-view render against the target
    vol_span, step_res = 20, 2
    h = vol_span / (eta.shape[0] - 1)
    ds = (vol_span / 128) / step_res
    rays, rpv = S.rand_rays_in_sphere(
        jax.random.PRNGKey(1234), 1, (resolution, resolution), 32, vol_span,
        sensor_dist=0)
    sensor_p, sensor_n, sensor_t = common.per_view_planes(rays.planes, rpv)
    xm, vm = tracer.trace(eta, rays.x, rays.v, h, ds)
    xmp, vmp = sensors.trace_rays_to_plane(
        (xm, vm), (rays.planes[:, 0, :], rays.planes[:, 1, :]))
    im = S.sum_norm(sensors.generate_sensor(
        (xmp, vmp), 1.0, (sensor_p[0], sensor_n[0]), resolution, vol_span,
        sensor_t[0], mask=rays.mask))
    a = np.asarray(im).ravel() - float(np.mean(im))
    b = np.asarray(einstein).ravel() - float(np.mean(einstein))
    corr = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    report = {"first_loss": float(hist[0]), "last_loss": float(hist[-1]),
              "n_iters": len(hist), "stage_res": int(eta.shape[0]),
              "corr_einstein_single_view": corr}
    with open(f"{RESULT_DIR}/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

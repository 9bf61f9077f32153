"""North-star fuel-injection run: 129^3 grid, 10M rays/iteration (BASELINE.md).

Scales the fuel-injection tomography experiment
(/root/reference/core/fuel_injection_opt.py:38-110) to the driver's
north-star size: the 64^3 GT volume upsampled to 129^3, a FIXED measurement
set of 32 views x 128^2 pixels x 20 spp = 10,485,760 rays traced once
through the GT, then a short coarse-to-fine ladder (33 -> 65 -> 129) where
every iteration accumulates the voxel gradient over ray microbatches
(10M rays in 16 chunks of 655,360 at the final stage).  Adam moments are
trilinearly upsampled between stages and lr halves per stage, exactly as the
production multires engine does.

Artifacts (results/fuel_northstar/): metrics.jsonl (per-iteration loss,
rays/iter, rays/s), report.json (reconstruction error vs GT), final_eta.npy.
"""

import json
import os
import time

import numpy as np

import jax

if os.environ.get("NS_CPU"):  # CPU dry run (sitecustomize overrides
    jax.config.update("jax_platforms", "cpu")  # JAX_PLATFORMS, so in-process)
import jax.numpy as jnp
import optax

from adjointnonlinearraytracing_tpu import sensors, tracer
from adjointnonlinearraytracing_tpu.experiments import common, fuel_injection, voxel_scenes
from adjointnonlinearraytracing_tpu.fields.grid import upres_volume
from adjointnonlinearraytracing_tpu.opt.multires import (
    _find_adam_state, boundary_interior_mask, upres_adam_state, upres_scene)
from adjointnonlinearraytracing_tpu.sources import sources as S

RESULT_DIR = os.environ.get("NS_DIR", "results/fuel_northstar")
VOL_SPAN = 1.0
FUEL_VAL = 0.0003
DEFL_WEIGHT = 1.0
_SCALE = int(os.environ.get("NS_SCALE", "1"))  # 1 = full north star;
# >1 divides views/bins for a quick CPU dry run of the same code path
NVIEWS, NBINS, SPP = 32 // _SCALE, 128 // _SCALE, 20
CHUNK = NVIEWS * NBINS * NBINS * SPP // 16  # 655,360 at full scale
# (stage res, iterations, chunks/iteration) — full 16-chunk set at 129^3
if _SCALE == 1:
    STAGES = [(33, 20, 2), (65, 12, 4), (129, 8, 16)]
else:
    STAGES = [(9, 3, 2), (17, 2, 16)]
LR = 1e-4

os.makedirs(RESULT_DIR, exist_ok=True)
res_final = STAGES[-1][0]
h_fin = VOL_SPAN / (res_final - 1)
ds = h_fin / 2

gt = upres_volume(voxel_scenes.fuel_injection_rif(FUEL_VAL), (res_final,) * 3)

print("generating measurement rays ...", flush=True)
rays, _rpv = S.rand_rays_in_sphere(
    jax.random.PRNGKey(0), NVIEWS, (NBINS, NBINS), SPP, VOL_SPAN,
    sensor_dist=0)
x_all = np.asarray(rays.x, dtype=np.float32)
v_all = np.asarray(rays.v, dtype=np.float32)
sp_all = np.asarray(rays.planes[:, 0, :], dtype=np.float32)
sn_all = np.asarray(rays.planes[:, 1, :], dtype=np.float32)
mask_all = np.asarray(rays.mask)
nrays = x_all.shape[0]
nchunks_total = nrays // CHUNK
assert nrays == NVIEWS * NBINS * NBINS * SPP, nrays

print(f"tracing GT exits for {nrays:,} rays ...", flush=True)


@jax.jit
def gt_trace(eta, x, v, sp, sn):
    xm, vm = tracer.trace(eta, x, v, h_fin, ds)
    return sensors.trace_rays_to_plane((xm, vm), (sp, sn))


t0 = time.perf_counter()
xg_chunks, vg_chunks = [], []
for c in range(nchunks_total):
    s = slice(c * CHUNK, (c + 1) * CHUNK)
    xg, vg = gt_trace(gt, x_all[s], v_all[s], sp_all[s], sn_all[s])
    xg_chunks.append(np.asarray(xg))
    vg_chunks.append(np.asarray(vg))
xgt = np.concatenate(xg_chunks)
vgt = np.concatenate(vg_chunks)
print(f"GT trace: {time.perf_counter() - t0:.1f}s", flush=True)

rel0 = common.gradient_spotcheck(
    jnp.ones((17,) * 3) + FUEL_VAL, jnp.asarray(x_all[:2048]),
    jnp.asarray(v_all[:2048]), VOL_SPAN, ds, mask=jnp.asarray(mask_all[:2048]))
print(f"grad spotcheck (adjoint vs exact, 17^3): {rel0:.2e}", flush=True)

metrics = open(f"{RESULT_DIR}/metrics.jsonl", "a")


def make_chunk_grad(res):
    h = VOL_SPAN / (res - 1)

    def chunk_loss(eta, x, v, sp, sn, xg, vg, m):
        xm, vm = tracer.trace(eta, x, v, h, ds)
        xmp, vmp = sensors.trace_rays_to_plane((xm, vm), (sp, sn))
        disp = common.masked_mean_sq(xmp - xg, m) / 3.0
        defl = common.masked_mean_sq(vmp - vg, m) / 3.0
        return (disp + DEFL_WEIGHT * defl) / FUEL_VAL

    return jax.jit(jax.value_and_grad(chunk_loss))


eta = jnp.ones((STAGES[0][0],) * 3, dtype=jnp.float32) + FUEL_VAL
opt = optax.adam(LR)
opt_state = opt.init(eta)
stage_lr = LR
it_total = 0

for stage, (res, iters, cpi) in enumerate(STAGES):
    grad_fn = make_chunk_grad(res)
    bmask = boundary_interior_mask(eta.shape)

    @jax.jit
    def apply(eta, opt_state, g):
        updates, opt_state = opt.update(g * bmask.astype(g.dtype),
                                        opt_state, eta)
        eta = optax.apply_updates(eta, updates)
        return jnp.maximum(eta, 1.0), opt_state

    for i in range(iters):
        t0 = time.perf_counter()
        g = jnp.zeros_like(eta)
        loss = 0.0
        for k in range(cpi):
            c = (i * cpi + k) % nchunks_total
            s = slice(c * CHUNK, (c + 1) * CHUNK)
            l, gc = grad_fn(eta, x_all[s], v_all[s], sp_all[s], sn_all[s],
                            xgt[s], vgt[s], mask_all[s])
            g = g + gc
            loss += float(l)
        eta, opt_state = apply(eta, opt_state, g / cpi)
        jax.block_until_ready(eta)
        dt = time.perf_counter() - t0
        rec = dict(iter=it_total, res=res, loss=loss / cpi,
                   rays=cpi * CHUNK, secs=round(dt, 2),
                   rays_per_s=round(cpi * CHUNK / dt, 1))
        metrics.write(json.dumps(rec) + "\n")
        metrics.flush()
        print(rec, flush=True)
        it_total += 1

    err = fuel_injection.reconstruction_error(eta, gt)
    print(f"stage {res}^3 reconstruction: {err}", flush=True)
    metrics.write(json.dumps(dict(stage=res, **err)) + "\n")
    metrics.flush()

    if stage < len(STAGES) - 1:
        new_res = STAGES[stage + 1][0]
        eta = upres_scene(eta, new_res)
        stage_lr *= 0.5
        opt = optax.adam(stage_lr)
        fresh = opt.init(eta)
        i_old, adam_old = _find_adam_state(opt_state)
        opt_state = tuple(
            upres_adam_state(adam_old, new_res) if j == i_old else sj
            for j, sj in enumerate(fresh))

err = fuel_injection.reconstruction_error(eta, gt)
report = dict(
    grid=f"{res_final}^3", rays_per_iter=16 * CHUNK,
    final_loss=float(loss / cpi), reconstruction=err,
    grad_spotcheck=rel0,
)
with open(f"{RESULT_DIR}/report.json", "w") as f:
    json.dump(report, f, indent=2)
np.save(f"{RESULT_DIR}/final_eta.npy", np.asarray(eta))
print(json.dumps(report))

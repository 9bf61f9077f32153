"""North-star fuel-injection run: 129^3 grid, 10M rays/iteration (BASELINE.md).

Scales the fuel-injection tomography experiment
(/root/reference/core/fuel_injection_opt.py:38-110) to the driver's
north-star size: the 64^3 GT volume upsampled to 129^3, a FIXED measurement
set of 32 views x 128^2 pixels x 20 spp = 10,485,760 rays traced once
through the GT at the finest step size, then a coarse-to-fine ladder
(9 -> 17 -> 33 -> 65 -> 129, mirroring the reference's res_list depth)
where every iteration accumulates the voxel gradient over ray microbatches
(10M rays in 16 chunks of 655,360 at the final stage).  Adam moments are
trilinearly upsampled between stages and lr halves per stage, exactly as the
production multires engine does.

Round-3 changes vs the round-2 run (VERDICT.md Weak #1):
  * the GT loader no longer double-applies the RIF rescale (voxel_scenes.py)
    so the plume is a real 3e-4 signal instead of f32 noise;
  * coarse stages use ds = h_stage/2 (the integrator only needs to resolve
    the stage's own trilinear field; the final stage keeps the reference's
    ds = h_final/step_res convention, fuel_injection_opt.py:33-34);
  * the adjoint-vs-exact gradient spot-check runs at EVERY stage's actual
    resolution, not just 17^3;
  * reference-scale iteration counts (hundreds on the cheap coarse stages);
  * reconstruction error (signal-relative rel_norm + the reference's
    ref_norm, run_fuel_injection_2008.py:230-234) is logged every
    NS_ERR_EVERY iterations, not only at stage ends.

Artifacts (results/fuel_northstar/): metrics.jsonl (per-iteration loss,
rays/iter, rays/s, periodic rel_norm), report.json, final_eta.npy.
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
# (stage res, iterations, chunks/iteration) — full 16-chunk set at 129^3.
# NS_STAGES overrides, e.g. "33:200:2,65:100:4" for a partial run.
if os.environ.get("NS_STAGES"):
    STAGES = [tuple(int(v) for v in s.split(":"))
              for s in os.environ["NS_STAGES"].split(",")]
elif _SCALE == 1:
    STAGES = [(9, 100, 1), (17, 100, 1), (33, 300, 2), (65, 200, 4),
              (129, 60, 16)]
else:
    STAGES = [(9, 3, 2), (17, 2, 16)]
LR = float(os.environ.get("NS_LR", "1e-4"))
ERR_EVERY = int(os.environ.get("NS_ERR_EVERY", "20"))
DS_MODE = os.environ.get("NS_DS_MODE", "stage")  # stage | final
# NS_TV > 0 adds the smoothness prior on the signal-scaled deviation
# (experiments/fuel_injection.py regularizer; VERDICT r4 #6 control for the
# "0.271 is the measurement-model floor" claim).  NS_REG picks tv|h1.
TV_WEIGHT = float(os.environ.get("NS_TV", "0"))
REG_KIND = os.environ.get("NS_REG", "tv")
# NS_DS_ALPHA scales the step size: ds = alpha * h_stage (default 0.5, the
# repo's historical ds = h/2).  The fuel field peaks at 1+3e-4, so alpha up
# to ~1.0 stays inside the paired fast path with ANRT_NMAX=1.001; accuracy
# at alpha=1.0 is quantified in benchmarks/ds_study.py (fuel_weak scene:
# 1.8e-5 voxel plane error, gradient cos 0.993).
DS_ALPHA = float(os.environ.get("NS_DS_ALPHA", "0.5"))

os.makedirs(RESULT_DIR, exist_ok=True)
res_final = STAGES[-1][0]
h_fin = VOL_SPAN / (res_final - 1)
ds_fin = h_fin * DS_ALPHA


def stage_ds(res):
    if DS_MODE == "final":
        return ds_fin
    return (VOL_SPAN / (res - 1)) * DS_ALPHA  # = ds_fin at the final stage


gt = upres_volume(voxel_scenes.fuel_injection_rif(FUEL_VAL), (res_final,) * 3)
BG = 1.0 + FUEL_VAL

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

# exit-step compaction, on by default for spread-chord rigs (VERDICT r4 #8;
# +49% measured on spread-chord scenes, pallas/README.md); ANRT_BUCKETED
# overrides in both directions
from adjointnonlinearraytracing_tpu.tracer import compaction  # noqa: E402

if os.environ.get("ANRT_BUCKETED") is not None:
    NBUCKETS = int(os.environ["ANRT_BUCKETED"])
else:
    NBUCKETS = compaction.auto_buckets(
        VOL_SPAN, jnp.asarray(x_all[:8192]), jnp.asarray(v_all[:8192]),
        ds_fin)
print(f"compaction buckets: {NBUCKETS}", flush=True)


def _trace(eta, x, v, h, ds):
    if NBUCKETS > 1:
        return compaction.trace_bucketed(eta, x, v, h, ds, NBUCKETS)
    return tracer.trace(eta, x, v, h, ds)

print(f"tracing GT exits for {nrays:,} rays (ds={ds_fin:.5f}) ...", flush=True)


@jax.jit
def gt_trace(eta, x, v, sp, sn):
    xm, vm = _trace(eta, x, v, h_fin, ds_fin)
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

metrics = open(f"{RESULT_DIR}/metrics.jsonl", "a")
spotchecks = {}


def regularizer(eta):
    """Smoothness prior on the signal-scaled deviation (NS_TV * this is
    added once per iteration; experiments/fuel_injection.py twin)."""
    e = (eta - 1.0) / FUEL_VAL
    dz = e[1:] - e[:-1]
    dy = e[:, 1:] - e[:, :-1]
    dx = e[:, :, 1:] - e[:, :, :-1]
    if REG_KIND == "h1":
        return jnp.mean(dz ** 2) + jnp.mean(dy ** 2) + jnp.mean(dx ** 2)
    eps = 1e-6
    return (jnp.mean(jnp.sqrt(dz ** 2 + eps))
            + jnp.mean(jnp.sqrt(dy ** 2 + eps))
            + jnp.mean(jnp.sqrt(dx ** 2 + eps)))


def make_chunk_grad(res, ds):
    h = VOL_SPAN / (res - 1)

    def chunk_loss(eta, x, v, sp, sn, xg, vg, m):
        xm, vm = _trace(eta, x, v, h, ds)
        xmp, vmp = sensors.trace_rays_to_plane((xm, vm), (sp, sn))
        disp = common.masked_mean_sq(xmp - xg, m) / 3.0
        defl = common.masked_mean_sq(vmp - vg, m) / 3.0
        loss = (disp + DEFL_WEIGHT * defl) / FUEL_VAL
        if TV_WEIGHT:
            # added per chunk, then the driver divides the SUM by cpi, so
            # the prior enters the averaged iteration loss exactly once
            loss = loss + TV_WEIGHT * regularizer(eta)
        return loss

    return jax.jit(jax.value_and_grad(chunk_loss))


if os.environ.get("NS_INIT"):
    # resume/finish: start the FIRST configured stage from a saved eta
    # (upres'd if needed) instead of the flat background; pair with
    # NS_STAGES and NS_LR to run e.g. a trimmed final stage standalone
    eta = jnp.asarray(np.load(os.environ["NS_INIT"]), dtype=jnp.float32)
    if eta.shape[0] != STAGES[0][0]:
        eta = upres_scene(eta, STAGES[0][0])
else:
    eta = jnp.ones((STAGES[0][0],) * 3, dtype=jnp.float32) + FUEL_VAL
opt = optax.adam(LR)
opt_state = opt.init(eta)
stage_lr = LR
it_total = 0

for stage, (res, iters, cpi) in enumerate(STAGES):
    ds = stage_ds(res)
    grad_fn = make_chunk_grad(res, ds)
    bmask = boundary_interior_mask(eta.shape)

    # adjoint-vs-checkpointed-exact gradient drift at THIS stage's
    # resolution and step size (VERDICT round 2, Weak #1b)
    # perturbation amplitude 10x the fuel signal (3e-3): representative of
    # the strongest transient field this optimization can visit, instead of
    # the default 5% bump (~170x the signal) whose much stronger ray bending
    # dominates the drift measurement
    stats = common.gradient_spotcheck(
        eta, jnp.asarray(x_all[:2048]), jnp.asarray(v_all[:2048]),
        VOL_SPAN, ds, mask=jnp.asarray(mask_all[:2048]),
        perturb_amp=10 * FUEL_VAL)
    rel = stats["max_rel"]
    spotchecks[str(res)] = stats
    print(f"stage {res}^3 grad spotcheck (adjoint vs exact): {rel:.2e} "
          f"(rel-L2 {stats['rel_l2']:.2e}, cos {stats['cos']:.4f})",
          flush=True)
    metrics.write(json.dumps(dict(stage_start=res, ds=ds,
                                  grad_spotcheck=rel, **stats)) + "\n")

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
        if i % ERR_EVERY == ERR_EVERY - 1 or i == iters - 1:
            rec.update(fuel_injection.reconstruction_error(
                eta, gt, background=BG))
        metrics.write(json.dumps(rec) + "\n")
        metrics.flush()
        print(rec, flush=True)
        it_total += 1

    err = fuel_injection.reconstruction_error(eta, gt, background=BG)
    print(f"stage {res}^3 reconstruction: {err}", flush=True)
    metrics.write(json.dumps(dict(stage=res, **err)) + "\n")
    metrics.flush()
    np.save(f"{RESULT_DIR}/eta_{res}.npy", np.asarray(eta))

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

err = fuel_injection.reconstruction_error(eta, gt, background=BG)
report = dict(
    grid=f"{res_final}^3", rays_per_iter=STAGES[-1][2] * CHUNK,
    final_loss=float(loss / cpi), reconstruction=err,
    grad_spotcheck_per_stage=spotchecks,
    stages=[list(s) for s in STAGES], lr=LR, ds_mode=DS_MODE,
    ds_alpha=DS_ALPHA, tv_weight=TV_WEIGHT, reg=REG_KIND, nbuckets=NBUCKETS,
)
with open(f"{RESULT_DIR}/report.json", "w") as f:
    json.dump(report, f, indent=2)
np.save(f"{RESULT_DIR}/final_eta.npy", np.asarray(eta))
print(json.dumps(report))

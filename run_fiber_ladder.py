"""Fiber full ladder to 129 bins vs sqrt(2-r^2) GT + refinement phases.

Round-3 version (VERDICT r2 item 8).  Two findings drive the design,
both measured on CPU (results/fiber_cpu_*):

* the reference YAML's ``projected_step: True`` (inherited by the hop2opt
  section) is required — without the n >= 1 projection, reference-scale
  stage lengths diverge (loss 1.0 -> 8.8 at the 17-bin stage);
* the stochastic loss (fresh rays per iteration) has an Adam noise floor
  far above loss(GT): the reference's own workflow refines a first run's
  checkpoint at much smaller lr (params-fiber.yaml:39-55 commented
  sections).  We run the ladder, then anneal lr with rising spp.

Context for the residual gap: loss(GT @33 bins) = 0.43 (ds-independent,
measured at ds/8) — the sqrt(2-r^2) profile self-images exactly in ARC
LENGTH, not at the fixed axial target points the loss uses, so the loss's
global minimizer is not exactly the GT profile; L1-to-GT bottoms out
around 0.09-0.10 under this measurement model (see results/fiber_129/
report.json for the measured ladder).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu.experiments import fiber

RESULT_DIR = os.environ.get("FIBER_DIR", "results/fiber_129")
ITERS = int(os.environ.get("FIBER_ITERS", "100"))
SPP = int(os.environ.get("FIBER_SPP", "2"))
# (lr, iters, spp) refinement ladder at the final bin count; overridable
# as FIBER_REFINE="2e-3:600:2,5e-4:600:4,1e-4:800:4" for time-boxed runs
REFINE = [(2e-3, 600, 2), (5e-4, 600, 4), (1e-4, 800, 4)]
if os.environ.get("FIBER_REFINE"):
    REFINE = [(float(a), int(b), int(c))
              for a, b, c in (s.split(":")
                              for s in os.environ["FIBER_REFINE"].split(","))]

os.makedirs(RESULT_DIR, exist_ok=True)
report = {"phases": []}


def flush_phase():
    """Incremental report + profile dump so a time-boxed run keeps its
    completed phases."""
    with open(f"{RESULT_DIR}/report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["phases"][-1]), flush=True)


def l1_to_gt(n):
    gt = fiber.ground_truth(int(n.shape[0]), dtype=n.dtype)
    return float(jnp.mean(jnp.abs(n - gt)))


if os.environ.get("FIBER_INIT"):
    # refinement-only: skip the ladder and anneal from a saved profile
    # (e.g. a previous run's plateau — the reference's init_scene workflow,
    # params-fiber.yaml:39-55)
    n = jnp.asarray(np.load(os.environ["FIBER_INIT"]))
    report["phases"].append(dict(phase="init", init=os.environ["FIBER_INIT"],
                                 l1_vs_gt=l1_to_gt(n)))
    flush_phase()
else:
    params = fiber.default_params()
    params.update(optim_iters=ITERS, record_iters=10 ** 9, spp=SPP)
    n, hist = fiber.multires_exp(params, result_dir=RESULT_DIR)
    report["phases"].append(dict(phase="ladder", optim_iters=ITERS, spp=SPP,
                                 l1_vs_gt=l1_to_gt(n),
                                 first_loss=float(hist[0]),
                                 last_loss=float(hist[-1])))
    flush_phase()

for i, (lr, iters, spp) in enumerate(REFINE):
    p_name = f"refine{i}"
    p = fiber.default_params()
    p.update(res_list=[int(n.shape[0])], init_profile=n, lr=lr,
             optim_iters=iters, spp=spp, record_iters=10 ** 9,
             grad_spotcheck=False, seed=100 + i)
    n, hist = fiber.multires_exp(p, result_dir=f"{RESULT_DIR}/refine{i}")
    report["phases"].append(dict(phase=f"refine{i}", lr=lr, iters=iters,
                                 spp=spp, l1_vs_gt=l1_to_gt(n),
                                 last_loss=float(hist[-1])))
    np.save(f"{RESULT_DIR}/profile_{p_name}.npy", np.asarray(n))
    flush_phase()

report.update(bins=int(n.shape[0]), l1_vs_gt=report["phases"][-1]["l1_vs_gt"])
np.save(f"{RESULT_DIR}/final_profile.npy", np.asarray(n))
with open(f"{RESULT_DIR}/report.json", "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps(report))

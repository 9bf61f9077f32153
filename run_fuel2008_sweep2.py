"""2008-baseline sweep, phase 2: the levers phase 1's grid was too timid on.

Phase-1 finding (results/fuel2008_sweep/sweep.jsonl): LSQR damping up to
1e-3 leaves rel_norm pinned at 3.9036 — the error is not in the sub-1e-3
singular directions.  The repo's own phantom validation passes at a similar
amplitude but a 16^3 reconstruction (tests/test_experiments.py:155-160),
pointing at 64^3 conditioning.  Phase 2 therefore sweeps (a) damps up to
1.0, (b) coarser reconstruction grids (the resolution/conditioning
trade-off the 2008 method actually has), appending to the same sweep.jsonl.

Waits for phase 1 to finish (its report.json appearing) before starting.
"""

import json
import os
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from run_fuel2008_sweep import OUT_DIR, run_cfg  # noqa: E402


def main():
    from adjointnonlinearraytracing_tpu.experiments import voxel_scenes

    while not os.path.exists(f"{OUT_DIR}/report.json"):
        time.sleep(60)

    gt = voxel_scenes.fuel_injection_rif().astype(jnp.float64)
    screen = dict(nviews=32, nbins=64, spp=4, int_res=256, seed=0)
    rows = []

    for damp in (1e-2, 1e-1, 1.0):
        run_cfg(gt, f"damp_{damp:g}", dict(screen, damp=damp), rows)
    for rr in (16, 32, 48):
        run_cfg(gt, f"recon{rr}", dict(screen, recon_res=rr), rows)
    # best coarse grid with damping
    ok = [r for r in rows if "rel_norm" in r]
    best = min(ok, key=lambda r: r["rel_norm"])
    if best["cfg"].get("recon_res"):
        run_cfg(gt, f"recon{best['cfg']['recon_res']}_damp1e-2",
                dict(best["cfg"], damp=1e-2), rows)

    # best of phase 2 at the full reference protocol
    ok = [r for r in rows if "rel_norm" in r]
    best = min(ok, key=lambda r: r["rel_norm"])
    final_cfg = dict(best["cfg"])
    final_cfg["spp"] = 16
    final = run_cfg(gt, "BEST2_full_protocol", final_cfg, rows)

    with open(f"{OUT_DIR}/report2.json", "w") as f:
        json.dump(dict(rows=rows, best_screening=best,
                       best_full_protocol=final), f, indent=2)
    print("phase-2 complete; best full-protocol rel_norm:",
          final.get("rel_norm"))


if __name__ == "__main__":
    main()

"""On-chip rays/s vs step size on the official bench scene (VERDICT r4 #2).

The official bench holds ds = h/2 so BENCH_r* stays comparable across
rounds; this probe measures what the validated step-size envelope buys on
the same scene and hardware:

* alpha = 0.5: the official configuration (paired window path),
* alpha = 0.83: the largest step the paired precondition allows at the
  scene's actual peak index 1.2 (ds * nmax <= h, via ANRT_NMAX),
* alpha = 1.0 / 1.2: classic cell path (the reference envelope's top end).

Accuracy at each alpha is quantified separately in ds_study.py (bench
scene: plane error 1.3e-2 vox, gradient cos 0.990 at alpha = 1.0).

Usage (chip): python -m adjointnonlinearraytracing_tpu.benchmarks.probe_ds_speed
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def run_case(alpha, fast_path, nmax, res=128, nrays=1 << 18, iters=3):
    from adjointnonlinearraytracing_tpu import tracer
    from adjointnonlinearraytracing_tpu.benchmarks.scenes import build_case

    os.environ["ANRT_FAST_PATH"] = fast_path
    os.environ["ANRT_NMAX"] = str(nmax)
    rif, x0, v0, span = build_case(res=res, nrays=nrays)
    h = span / (res - 1)
    ds = alpha * h
    target = jnp.asarray([span / 2, span * 1.1, span / 2], dtype=rif.dtype)

    @jax.jit
    def fwd_bwd(rif, x, v):
        def loss(r):
            xt, vt = tracer.trace(r, x, v, h, ds)
            return jnp.sum((xt - target) ** 2) + jnp.sum(vt)

        return jax.grad(loss)(rif)

    g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    rec = {
        "alpha": alpha,
        "fast_path": fast_path,
        "nmax": nmax,
        "rays_per_s": round(nrays * iters / dt, 1),
        "vs_alpha_0.5_paired": None,
        "grad_finite": bool(jnp.isfinite(g).all()),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    rows = []
    rows.append(run_case(0.5, "auto", 2.0))     # official configuration
    rows.append(run_case(0.83, "auto", 1.205))  # paired at the scene bound
    rows.append(run_case(1.0, "classic", 2.0))
    rows.append(run_case(1.2, "classic", 2.0))
    base = rows[0]["rays_per_s"]
    for r in rows:
        r["vs_alpha_0.5_paired"] = round(r["rays_per_s"] / base, 3)
    out = os.environ.get("DS_SPEED_OUT", "results/probe_ds_speed.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

"""Benchmark: rays/s/chip, forward + adjoint, 128^3 grid (BASELINE.json).

Runs on whatever accelerator jax exposes (the driver runs it on one real TPU
chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the ratio
is against the first recorded round's BENCH_r*.json when present (tracking
our own progress), else 1.0.
"""

import glob
import json
import os
import sys
import time

import numpy as np


def build_case(res=128, nrays=1 << 18, span=20.0, dtype="float32"):
    from adjointnonlinearraytracing_tpu.benchmarks.scenes import build_case as _b

    return _b(res=res, nrays=nrays, span=span, dtype=dtype)


def _wait_for_backend(tries=8, delay=45):
    """The chip is single-client; retry attach if a stale holder lingers."""
    import time as _t

    for i in range(tries):
        try:
            import jax

            jax.devices()
            return
        except RuntimeError as e:
            if "Unable to initialize backend" not in str(e) or i == tries - 1:
                raise
            _t.sleep(delay)


def main():
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from adjointnonlinearraytracing_tpu import tracer

    res = int(os.environ.get("BENCH_RES", "128"))
    nrays = int(os.environ.get("BENCH_RAYS", str(1 << 18)))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    rif, x0, v0, span = build_case(res=res, nrays=nrays)
    h = span / (res - 1)
    ds = h / 2

    target = jnp.asarray([span / 2, span * 1.1, span / 2], dtype=rif.dtype)

    @jax.jit
    def fwd_bwd(rif, x, v):
        def loss(r):
            xt, vt = tracer.trace(r, x, v, h, ds)
            return jnp.sum((xt - target) ** 2) + jnp.sum(vt)

        return jax.grad(loss)(rif)

    # compile + warmup
    g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)

    # BENCH_PROFILE=<dir>: capture a jax.profiler trace of the timed region
    # (view with tensorboard or xprof; ROADMAP "profiling behind a flag")
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    t0 = time.perf_counter()
    for _ in range(iters):
        g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# profiler trace written to {profile_dir}", file=sys.stderr)

    rays_per_sec = nrays * iters / dt

    baseline = None
    here = os.path.dirname(os.path.abspath(__file__))
    for f in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(f))
            # driver-recorded rounds nest the printed JSON under "parsed"
            baseline = rec.get("value") or rec.get("parsed", {}).get("value")
            if baseline:
                break
        except Exception:
            pass
    vs = rays_per_sec / baseline if baseline else 1.0

    print(json.dumps({
        "metric": f"rays/s/chip fwd+adjoint {res}^3 grid",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        # the reference publishes no numbers (BASELINE.md); the ratio tracks
        # our own first recorded round, NOT parity vs the enoki/CUDA reference
        "baseline_kind": "self_round1" if baseline else "none",
    }))


if __name__ == "__main__":
    main()

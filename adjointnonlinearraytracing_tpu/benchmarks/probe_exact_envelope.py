"""On-chip validation of the microbatched exact path at the r4 crash scale.

Round 4: `trace_exact` at 1.31M rays / 65^3 reproducibly crashed the TPU
worker (~1.2 GB resident checkpoint+replay state, 3 crashes —
results/focalstack_r4.log, ROADMAP r4 finding).  Round 5 microbatches the
ray axis (ANRT_EXACT_CHUNK, tracer/checkpointed.py), bounding memory per
chunk.  This probe runs forward+gradient at exactly the crash configuration
(and the focal-stack finest stage, 1.31M / 129^3) and reports wall-clock —
green completion here is the evidence the crash envelope is closed.

Usage (chip):  python -m adjointnonlinearraytracing_tpu.benchmarks.probe_exact_envelope
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def run_case(res, nrays, steps=2):
    from adjointnonlinearraytracing_tpu import tracer
    from adjointnonlinearraytracing_tpu.benchmarks.scenes import build_case

    rif, x0, v0, span = build_case(res=res, nrays=nrays)
    h = span / (res - 1)
    ds = h / 2

    @jax.jit
    def fwd_bwd(rif, x, v):
        def loss(r):
            xt, vt = tracer.trace_exact(r, x, v, h, ds)
            return jnp.sum(xt ** 2 + xt * vt)

        return jax.grad(loss)(rif)

    t0 = time.perf_counter()
    g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)
    compile_and_first = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(steps):
        g = fwd_bwd(rif, x0, v0)
    jax.block_until_ready(g)
    per_step = (time.perf_counter() - t0) / steps

    finite = bool(jnp.isfinite(g).all())
    rec = {
        "res": res,
        "nrays": nrays,
        "chunk": int(os.environ.get("ANRT_EXACT_CHUNK", str(1 << 18))),
        "first_call_s": round(compile_and_first, 2),
        "per_step_s": round(per_step, 3),
        "rays_per_s_exact": round(nrays / per_step, 1),
        "grad_finite": finite,
    }
    print(json.dumps(rec))
    return rec


def main():
    # the r4 crash case, then the focal-stack finest stage
    run_case(65, 1_310_720)
    run_case(129, 1_310_720)


if __name__ == "__main__":
    main()

"""Profiling sweeps: AD-tape vs constant-memory adjoint over ds and res.

Twin of the reference benchmark binary (src/test.cpp): `profile_stepsize`
sweeps ds in {0.3..1.2} on a 33^3 grid with 512^2 rays, `profile_resolution`
sweeps res in {3,5,9,17,33,65,129,257} with 256^2 rays at ds=0.5
(test.cpp:148-318), timing forward+backward for both differentiation paths
and recording device memory when the backend exposes it.

Run:  python -m adjointnonlinearraytracing_tpu.benchmarks.sweeps stepsize
      python -m adjointnonlinearraytracing_tpu.benchmarks.sweeps resolution
Sizes are scaled down automatically on CPU.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _case(res, nrays, span=20.0, dtype="float32"):
    from .scenes import build_case

    return build_case(res=res, nrays=nrays, span=span, dtype=dtype)


def _is_oom(e: Exception) -> bool:
    """Device OOM heuristics: XLA phrasings vary by backend/version
    ('RESOURCE_EXHAUSTED', '... hbm', 'out of memory')."""
    msg = str(e).lower()
    return any(k in msg for k in ("memory", "resource_exhausted",
                                  "resource exhausted", "hbm"))


def _mem_stats():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        pass
    return None


def _time_grad(loss_fn, rif, iters=2):
    import jax
    import jax.numpy as jnp

    g = jax.jit(jax.grad(loss_fn))
    out = g(rif)
    _ = float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(rif)
        _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def profile_stepsize(nrays=None, res=33, iters=2, include_ad=True):
    """ds sweep on a 33^3 grid (test.cpp:148-239)."""
    import jax
    import jax.numpy as jnp

    from .. import tracer

    on_cpu = jax.default_backend() == "cpu"
    if nrays is None:
        nrays = 1 << 12 if on_cpu else 1 << 18

    rif, x0, v0, span = _case(res, nrays)
    h = span / (res - 1)
    rows = []
    for ds_mult in [0.3, 0.4, 0.5, 0.6, 0.8, 1.0, 1.2]:
        ds = h * ds_mult

        def loss_back(r):
            xt, vt = tracer.trace(r, x0, v0, h, ds)
            return jnp.sum(xt ** 2)

        t_back = _time_grad(loss_back, rif, iters)

        t_ad = None
        ad_oom = False
        if include_ad:
            def loss_ad(r):
                xt, vt = tracer.trace_ad(r, x0, v0, h, ds)
                return jnp.sum(xt ** 2)

            try:
                t_ad = _time_grad(loss_ad, rif, iters)
            except Exception as e:  # tape is O(steps*N): HBM OOM is a result
                if not _is_oom(e):
                    raise
                ad_oom = True

        row = dict(ds=round(ds, 5), ds_mult=ds_mult,
                   back_time_s=round(t_back, 4),
                   back_rays_per_s=round(nrays / t_back, 1),
                   ad_time_s="oom" if ad_oom else
                             (round(t_ad, 4) if t_ad else None),
                   mem_gb=_mem_stats())
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def profile_resolution(nrays=None, iters=2, include_ad=False,
                       res_list=None):
    """Resolution sweep at ds = h/2 (test.cpp:241-318).

    The default accelerator list matches the reference's largest point,
    257^3 (test.cpp:255); on CPU the sweep stops at 65 (257^3 takes hours
    there).  Executed on-chip evidence: results/sweep_resolution_257.jsonl.
    """
    import jax
    import jax.numpy as jnp

    from .. import tracer

    on_cpu = jax.default_backend() == "cpu"
    if res_list is None:
        res_list = (9, 17, 33, 65) if on_cpu else (9, 17, 33, 65, 129, 257)
    if nrays is None:
        nrays = 1 << 12 if on_cpu else 1 << 16

    rows = []
    for res in res_list:
        rif, x0, v0, span = _case(res, nrays)
        h = span / (res - 1)
        ds = h / 2

        def loss_back(r):
            xt, vt = tracer.trace(r, x0, v0, h, ds)
            return jnp.sum(xt ** 2)

        try:
            t_back = _time_grad(loss_back, rif, iters)
        except Exception as e:
            if not _is_oom(e):
                raise
            t_back = None
        t_ad, ad_oom = None, False
        if include_ad:
            def loss_ad(r):
                xt, vt = tracer.trace_ad(r, x0, v0, h, ds)
                return jnp.sum(xt ** 2)

            try:
                t_ad = _time_grad(loss_ad, rif, iters)
            except Exception as e:
                if not _is_oom(e):
                    raise
                ad_oom = True

        row = dict(res=res,
                   back_time_s="oom" if t_back is None else round(t_back, 4),
                   back_rays_per_s=round(nrays / t_back, 1) if t_back else None,
                   ad_time_s="oom" if ad_oom else
                             (round(t_ad, 4) if t_ad else None),
                   mem_gb=_mem_stats())
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main(argv):
    mode = argv[1] if len(argv) > 1 else "stepsize"
    if mode == "stepsize":
        profile_stepsize()
    elif mode == "resolution":
        # optional comma-separated res list, e.g. "resolution 129,257"
        kw = {}
        if len(argv) > 2:
            kw["res_list"] = tuple(int(r) for r in argv[2].split(","))
        profile_resolution(**kw)
    else:
        raise SystemExit(f"unknown mode {mode!r}; use stepsize|resolution")


if __name__ == "__main__":
    main(sys.argv)

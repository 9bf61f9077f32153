"""Exit-step compaction measurement on a spread-chord scene (ROADMAP item).

The official bench scene has uniform chords (exit steps 214-262) where
compaction cannot win; this harness builds the scene it is FOR — a
cone/sphere-rig style batch whose straight chords spread from grazing
(few steps) to full diagonal (hundreds) — and times fwd+adjoint with
1 (= plain trace), 2, 4, 8 buckets.

Run on the chip:  python -m adjointnonlinearraytracing_tpu.benchmarks.compaction_bench
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def spread_case(res=128, nrays=1 << 18, span=20.0, seed=0):
    """Rays entering one face at positions+angles spanning grazing to
    diagonal chords (a cone-rig profile, not the uniform bench chords)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    x = np.stack([
        rng.uniform(0, span, nrays),
        np.full(nrays, -1e-3),
        rng.uniform(0, span, nrays),
    ], axis=1).astype(np.float32)
    # direction: mostly +y but with pitch drawn so the in-volume chord varies
    # from a sliver to the full diagonal
    pitch = rng.uniform(0.05, 1.0, nrays)            # sin of elevation
    yaw = rng.uniform(0, 2 * np.pi, nrays)
    horiz = np.sqrt(1.0 - pitch ** 2)
    v = np.stack([horiz * np.cos(yaw), pitch, horiz * np.sin(yaw)],
                 axis=1).astype(np.float32)

    from .scenes import build_case

    rif, _, _, _ = build_case(res=res, nrays=8, span=span, dtype="float32")
    return rif, jnp.asarray(x), jnp.asarray(v), span


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ..tracer import compaction

    on_cpu = jax.default_backend() == "cpu"
    res = 33 if on_cpu else 128
    nrays = 1 << 12 if on_cpu else 1 << 18
    rif, x, v, span = spread_case(res=res, nrays=nrays)
    h = span / (res - 1)
    ds = h / 2

    steps = compaction.chord_steps(rif.shape, h, x, v, ds)
    spread = compaction.chord_spread(rif.shape, h, x, v, ds)
    print(json.dumps(dict(
        scene="spread", res=res, nrays=nrays,
        chord_steps_p10=float(jnp.percentile(steps, 10.0)),
        chord_steps_p90=float(jnp.percentile(steps, 90.0)),
        chord_spread=round(spread, 2))), flush=True)

    rows = []
    for k in ([1, 4] if on_cpu else [1, 2, 4, 8]):
        @jax.jit
        def fwd_bwd(rif):
            def loss(r):
                xt, vt = compaction.trace_bucketed(r, x, v, h, ds, nbuckets=k)
                return jnp.sum(xt ** 2) + jnp.sum(vt)
            return jax.grad(loss)(rif)

        g = fwd_bwd(rif)
        _ = float(jnp.sum(g))  # sync (axon: block_until_ready unreliable)
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fwd_bwd(rif)
            _ = float(jnp.sum(g))
        dt = (time.perf_counter() - t0) / iters
        row = dict(nbuckets=k, time_s=round(dt, 3),
                   rays_per_s=round(nrays / dt, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
    if len(rows) > 1:
        base = rows[0]["time_s"]
        best = min(rows[1:], key=lambda r: r["time_s"])
        print(json.dumps(dict(speedup_best=round(base / best["time_s"], 3),
                              at_buckets=best["nbuckets"])), flush=True)
    return rows


if __name__ == "__main__":
    main(sys.argv)

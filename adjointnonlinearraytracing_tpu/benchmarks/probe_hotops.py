"""In-loop scatter/gather width-scaling probe (run on a real chip).

Measures the per-step cost of (N, W) row gathers/scatter-adds *inside a
while_loop with evolving indices* — the only measurement pattern that is
trustworthy on this backend (standalone same-args dispatches get deduped and
report physically impossible times; see pallas/README.md "Row-width scaling"
for the recorded v5e results that motivated tracer/paired.py).

Usage: python -m adjointnonlinearraytracing_tpu.benchmarks.probe_hotops
"""
import time

import jax
import jax.numpy as jnp
from jax import lax

N = 1 << 18
STEPS = 100
TAB_BYTES = 70 << 20
key = jax.random.PRNGKey(0)


def run(fn, *args):
    o = fn(*args)
    s = float(jnp.sum(o))
    t0 = time.perf_counter()
    o = fn(*args)
    s += float(jnp.sum(o))
    return (time.perf_counter() - t0) / STEPS, s


print(f"{'rows':>8} {'width':>6} {'scat ms/step':>13} {'Mrows/s':>9} {'GB/s':>8}")
for rows, width in [(N, 8), (N, 16), (N, 32), (N, 64), (N, 128),
                    (N // 2, 8), (N // 2, 64), (N // 4, 8), (N // 4, 128),
                    (N // 4, 512), (N, 512)]:
    ncells = max(TAB_BYTES // (width * 4), 2048)
    idx0 = jax.random.randint(key, (rows,), 0, ncells)
    vals = jax.random.normal(key, (rows, width), jnp.float32)
    tab = jnp.zeros((ncells, width), jnp.float32)

    @jax.jit
    def scat_loop(tab, idx0, vals):
        def body(s):
            i, idx, g = s
            g = g.at[idx].add(vals, mode="promise_in_bounds")
            idx = (idx + 7919) % ncells
            return i + 1, idx, g

        return lax.while_loop(lambda s: s[0] < STEPS, body, (0, idx0, tab))[2]

    dt, _ = run(scat_loop, tab, idx0, vals)
    print(f"{rows:>8} {width:>6} {dt*1e3:>13.3f} {rows/dt/1e6:>9.1f}"
          f" {rows*width*4*2/dt/1e9:>8.1f}")

print(f"\n{'rows':>8} {'width':>6} {'gath ms/step':>13} {'Mrows/s':>9} {'GB/s':>8}")
for rows, width in [(N, 8), (N, 32), (N, 64), (N, 128), (N // 2, 8),
                    (N // 2, 64), (N // 4, 128), (N // 4, 512)]:
    ncells = max(TAB_BYTES // (width * 4), 2048)
    idx0 = jax.random.randint(key, (rows,), 0, ncells)
    tab = jax.random.normal(key, (ncells, width), jnp.float32)

    @jax.jit
    def gath_loop(tab, idx0):
        acc0 = jnp.zeros((rows, width), jnp.float32)

        def body(s):
            i, idx, acc = s
            acc = acc + tab.at[idx].get(mode="promise_in_bounds")
            idx = (idx + 7919) % ncells
            return i + 1, idx, acc

        return lax.while_loop(lambda s: s[0] < STEPS, body, (0, idx0, acc0))[2]

    dt, _ = run(gath_loop, tab, idx0)
    print(f"{rows:>8} {width:>6} {dt*1e3:>13.3f} {rows/dt/1e6:>9.1f}"
          f" {rows*width*4/dt/1e9:>8.1f}")

"""Probe: XLA scatter-add cost vs (row width, destination rows) on TPU.

Each case runs a while_loop of STEPS iterations; every iteration scatters
(N, L) rows at evolving pseudo-random row indices into an (R, L) table.
Also probes: gather rows at widths beyond 128, sort+segment_sum as a
scatter replacement, and a per-ray contiguous accumulate (no scatter).

Methodology (learned the hard way, see probe_scatter2): results must be
synced via a host transfer (float(sum)) — block_until_ready does not
reliably wait on the axon backend — and repeated dispatches need distinct
inputs or they get deduped server-side.
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

N = 1 << 18
STEPS = 64


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, argsets, unit_rows=N * STEPS):
    _sync(fn(*argsets[0]))
    times = []
    for a in argsets[1:]:
        t0 = time.perf_counter()
        _sync(fn(*a))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per_row_ns = dt / unit_rows * 1e9
    print(f"{name:44s} {dt / STEPS * 1e3:8.2f} ms/step"
          f"  {per_row_ns:6.2f} ns/row")
    return dt


def evolve(idx, r):
    # cheap LCG keeps indices pseudo-random and data-dependent
    return (idx * 1664525 + 1013904223) % r


def scatter_case(R, L):
    def fn(idx0, vals):
        g = jnp.zeros((R, L), dtype=jnp.float32)

        def body(s):
            i, idx, g = s
            g = g.at[idx].add(vals, mode="promise_in_bounds")
            return i + 1, evolve(idx, R), g

        _, _, g = lax.while_loop(lambda s: s[0] < STEPS, body,
                                 (0, idx0, g))
        return g
    return jax.jit(fn)


def gather_case(R, L):
    def fn(idx0, table):
        acc = jnp.zeros((N, L), dtype=jnp.float32)

        def body(s):
            i, idx, acc = s
            rows = table.at[idx].get(mode="promise_in_bounds")
            return i + 1, evolve(idx, R), acc + rows

        _, _, acc = lax.while_loop(lambda s: s[0] < STEPS, body,
                                   (0, idx0, acc))
        return acc
    return jax.jit(fn)


def segsum_case(R, L, sort=True):
    def fn(idx0, vals):
        g = jnp.zeros((R, L), dtype=jnp.float32)

        def body(s):
            i, idx, g = s
            if sort:
                order = jnp.argsort(idx)
                si = idx[order]
                sv = vals[order]
                g = g + jax.ops.segment_sum(sv, si, num_segments=R,
                                            indices_are_sorted=True)
            else:
                g = g + jax.ops.segment_sum(vals, idx, num_segments=R)
            return i + 1, evolve(idx, R), g

        _, _, g = lax.while_loop(lambda s: s[0] < STEPS, body,
                                 (0, idx0, g))
        return g
    return jax.jit(fn)


def main():
    key = jax.random.PRNGKey(0)

    def argsets(R, L, n=3, table=False):
        sets = []
        for i in range(n + 1):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            idx = jax.random.randint(k1, (N,), 0, R, dtype=jnp.int32)
            arr = jax.random.normal(
                k2, (R, L) if table else (N, L), dtype=jnp.float32)
            sets.append((idx, arr))
        return sets

    for R, L in [(1 << 14, 128), (139000, 8), (139000, 64), (139000, 128),
                 (139000, 256), (139000, 512), (2146689, 64),
                 (2146689, 128), (1 << 14, 64), (1 << 17, 128)]:
        timeit(f"scatter R={R:>8} L={L:>3}", scatter_case(R, L),
               argsets(R, L))

    for R, L in [(2146689, 64), (2146689, 216), (2146689, 512)]:
        timeit(f"gather  R={R:>8} L={L:>3}", gather_case(R, L),
               argsets(R, L, table=True))

    for R, L in [(139000, 8), (139000, 64)]:
        timeit(f"sort+segsum R={R:>8} L={L:>3}", segsum_case(R, L),
               argsets(R, L))
        timeit(f"segsum(unsorted) R={R:>8} L={L:>3}",
               segsum_case(R, L, sort=False), argsets(R, L))


if __name__ == "__main__":
    main()

"""Probe: dense-ops scatter replacements under the REAL bench coherence
(VERDICT r3 #2 — "attack the ~40x dense-ops headroom").

Structural facts measured offline (CPU replica of the bench scene,
64^3 / 32k rays, scripts inline in the round-4 transcript):

* destination DUPLICATION is huge: mean unique-row fraction 0.026 per
  pair-step (40x) — rays march as a coherent depth slab;
* destination COMPACTNESS is absent: the min..max spread of active rows
  is 27k-32.7k of a 36k-row table (91%) — the site index is z-major
  while the bench rays march +y, and rig-style sources march every
  direction, so no static table ordering makes the active set a band.

So the open question is purely the cost of GROUPING the 40x-duplicated
rows.  Candidate formulations against the baseline random scatter into the
full (sites, 125) table (~16 ns/row measured in round 2):

  A. baseline      g.at[idx].add(rows)          destination 275k x 125
  B. band          band.at[idx - lo].add(rows)  destination 16k/32k x 125
                   + one dense flush add per K steps (dynamic-update-slice)
  C. sort+segsum   argsort(idx); take rows; segment_sum; scatter uniques
                   (the permute's ~14 ns/row is the question)
  D. segsum        jax.ops.segment_sum straight (lowers to scatter — control)

Indices are generated with the bench scene's measured coherence profile:
96% of rays in a +/-BAND/4 window around a drifting center, 4% stragglers
uniform over the table (the escaped/slow tail), evolving each step like the
real sweep (center advances ~rowlen sites per step).

Run on the real chip:  python -m ...benchmarks.probe_bandscatter
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = 1 << 18
L = 125
SITES = 275_000          # snapped site count at 128^3: (64+2)^3 ~ 287k
ROWLEN = 66 * 66         # sites per z-layer
STEPS = 64
BAND = 1 << 14           # 16k-row dense accumulator (8 MB at L=128)


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, argsets):
    _sync(fn(*argsets[0]))
    times = []
    for a in argsets[1:]:
        t0 = time.perf_counter()
        _sync(fn(*a))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:34s} {dt / STEPS * 1e3:8.2f} ms/step"
          f"  {dt / (N * STEPS) * 1e9:6.2f} ns/row", flush=True)
    return dt


def coherent_idx(key, step):
    """Bench-profile indices: a drifting dense slab + a straggler tail."""
    k1, k2, k3 = jax.random.split(key, 3)
    center = (20 + step) * ROWLEN
    main = center + jax.random.randint(k1, (N,), -BAND // 4, BAND // 4)
    tail = jax.random.randint(k2, (N,), 0, SITES)
    is_tail = jax.random.uniform(k3, (N,)) < 0.04
    return jnp.clip(jnp.where(is_tail, tail, main), 0, SITES - 1).astype(
        jnp.int32)


def baseline_case():
    def fn(keys, vals):
        g = jnp.zeros((SITES, L), jnp.float32)

        def body(s):
            i, g = s
            idx = coherent_idx(keys[i], i)
            g = g.at[idx].add(vals, mode="promise_in_bounds")
            return i + 1, g

        _, g = lax.while_loop(lambda s: s[0] < STEPS, body, (0, g))
        return g
    return jax.jit(fn)


def band_case(flush_every=8):
    """Dense band accumulator: in-band rows scatter into a BAND-row table
    (8 MB — the measured 8.3 ns/row regime); out-of-band rows scatter into
    the big table directly (few); the band flushes into the big table with
    one dynamic-update-slice add every `flush_every` steps."""
    def fn(keys, vals):
        g = jnp.zeros((SITES + BAND, L), jnp.float32)  # pad for slice add
        band = jnp.zeros((BAND, L), jnp.float32)
        lo = jnp.int32(20 * ROWLEN)

        def body(s):
            i, g, band, lo = s
            idx = coherent_idx(keys[i], i)
            off = idx - lo
            in_band = (off >= 0) & (off < BAND)
            off_c = jnp.clip(off, 0, BAND - 1)
            band = band.at[off_c].add(
                jnp.where(in_band[:, None], vals, 0.0),
                mode="promise_in_bounds")
            g = g.at[idx].add(jnp.where(in_band[:, None], 0.0, vals),
                              mode="promise_in_bounds")

            def flush(args):
                g, band, lo = args
                cur = lax.dynamic_slice(g, (lo, 0), (BAND, L))
                g = lax.dynamic_update_slice(g, cur + band, (lo, 0))
                # re-center the band on the drifted slab
                return g, jnp.zeros_like(band), lo + jnp.int32(
                    flush_every * ROWLEN)

            g, band, lo = lax.cond((i + 1) % flush_every == 0, flush,
                                   lambda a: a, (g, band, lo))
            return i + 1, g, band, lo

        _, g, band, lo = lax.while_loop(lambda s: s[0] < STEPS, body,
                                        (0, g, band, lo))
        cur = lax.dynamic_slice(g, (lo, 0), (BAND, L))
        g = lax.dynamic_update_slice(g, cur + band, (lo, 0))
        return g[:SITES]
    return jax.jit(fn)


def sort_segsum_case():
    def fn(keys, vals):
        g = jnp.zeros((SITES, L), jnp.float32)

        def body(s):
            i, g = s
            idx = coherent_idx(keys[i], i)
            order = jnp.argsort(idx)
            si = jnp.take(idx, order)
            sv = jnp.take(vals, order, axis=0)
            seg = jax.ops.segment_sum(sv, si, num_segments=SITES,
                                      indices_are_sorted=True)
            return i + 1, g + seg

        _, g = lax.while_loop(lambda s: s[0] < STEPS, body, (0, g))
        return g
    return jax.jit(fn)


def segsum_case():
    def fn(keys, vals):
        g = jnp.zeros((SITES, L), jnp.float32)

        def body(s):
            i, g = s
            idx = coherent_idx(keys[i], i)
            seg = jax.ops.segment_sum(vals, idx, num_segments=SITES)
            return i + 1, g + seg

        _, g = lax.while_loop(lambda s: s[0] < STEPS, body, (0, g))
        return g
    return jax.jit(fn)


def sort_only_case():
    """Cost attribution: the argsort alone, in-loop."""
    def fn(keys, vals):
        acc = jnp.zeros((N,), jnp.int32)

        def body(s):
            i, acc = s
            idx = coherent_idx(keys[i], i)
            order = jnp.argsort(idx)
            return i + 1, acc + order

        _, acc = lax.while_loop(lambda s: s[0] < STEPS, body, (0, acc))
        return acc
    return jax.jit(fn)


def take_only_case():
    """Cost attribution: the (N, 125) permute-gather alone, in-loop."""
    def fn(keys, vals):
        acc = jnp.zeros((N, L), jnp.float32)

        def body(s):
            i, acc = s
            idx = coherent_idx(keys[i], i)
            order = jnp.argsort(idx)  # realistic permutation
            return i + 1, acc + jnp.take(vals, order, axis=0)

        _, acc = lax.while_loop(lambda s: s[0] < STEPS, body, (0, acc))
        return acc
    return jax.jit(fn)


def main():
    key = jax.random.PRNGKey(0)

    def argsets(n=3):
        sets = []
        for i in range(n + 1):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            keys = jax.random.split(k1, STEPS)
            vals = jax.random.normal(k2, (N, L), jnp.float32)
            sets.append((keys, vals))
        return sets

    a = argsets()
    # correctness cross-check of the band formulation before timing
    gb = band_case()(a[0][0], a[0][1])
    g0 = baseline_case()(a[0][0], a[0][1])
    err = float(jnp.abs(gb - g0).max() / jnp.maximum(jnp.abs(g0).max(), 1e-9))
    print(f"band-vs-baseline max rel err: {err:.2e}", flush=True)

    timeit("A baseline scatter 275k", baseline_case(), a)
    timeit("B band scatter 16k + flush/8", band_case(8), a)
    timeit("B band scatter 16k + flush/16", band_case(16), a)
    timeit("C sort+take+segsum(sorted)", sort_segsum_case(), a)
    timeit("D segsum(unsorted ids)", segsum_case(), a)
    timeit("attribution: argsort only", sort_only_case(), a)
    timeit("attribution: argsort+take(N,125)", take_only_case(), a)


if __name__ == "__main__":
    main()

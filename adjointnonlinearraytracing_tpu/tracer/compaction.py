"""Exit-step compaction: bucketed tracing for spread path-length sources.

The stepper while_loops early-exit only when ALL rays in the batch have
escaped (tracer/eikonal.py, mirroring /root/reference/src/tracer.cpp:82-84),
so one long ray keeps every lane marching.  On uniform-chord scenes (the
official bench: exit steps 214-262) that wastes <20%, but wide-spread
sources — sphere rigs, cone rigs, grazing rays — mix 10-step and 500-step
rays in one batch.

``trace_bucketed`` sorts rays by a *straight-chord* step estimate (the
AABB entry/exit distance of the undeflected ray over ds — curvature changes
path length by O(|∇n| L²), small for physical fields), splits them into K
equal static buckets, and traces each bucket separately: every bucket's
forward AND adjoint while_loop now stops at roughly its own longest member.
Results are unsorted back, so outputs and gradients are exactly those of
``trace`` (per-ray dynamics are independent; the permutation is undone).

Cost: one argsort + two takes (O(N log N) host-free) + K loop dispatches
instead of 1.  Worth it only when the chord spread is real — callers gate on
``chord_spread`` (e.g. >= 2x between bucket means).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import api


def chord_steps(shape, h, x, v, ds):
    """Straight-line step count through the volume AABB per ray.

    Slab method on [0, (res-1)*h] per axis with the *unnormalized* velocity
    (|v| = n ~ 1 at entry, matching the integrator's arc parameter); rays
    that miss the box get 0.
    """
    extent = jnp.asarray([(s - 1) * h for s in (shape[2], shape[1], shape[0])],
                         dtype=x.dtype)
    # large-finite sentinel, not inf: a ray starting exactly on a slab plane
    # with zero velocity in that axis would hit 0*inf = NaN and be misplaced
    # into the shortest bucket (ADVICE r2)
    zero = jnp.abs(v) <= 1e-12
    inv = jnp.where(zero, 1e30, 1.0 / jnp.where(zero, 1.0, v))
    t0 = (0.0 - x) * inv
    t1 = (extent - x) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tin = jnp.maximum(tmin, 0.0)
    chord = jnp.maximum(tmax - tin, 0.0)
    hit = tmax > tin
    return jnp.where(hit, chord / ds, 0.0)


def chord_spread(shape, h, x, v, ds):
    """(p90 / max(p10, 1)) of the chord-step estimate — the gating statistic:
    ~1 on uniform scenes (no compaction win), >=2 on spread sources."""
    steps = chord_steps(shape, h, x, v, ds)
    p10, p90 = jnp.percentile(steps, jnp.asarray([10.0, 90.0]))
    return float(p90 / jnp.maximum(p10, 1.0))


def auto_buckets(vol_span, x, v, ds, threshold=3.0, k=4):
    """Default bucket count for a source sample (VERDICT r4 #8).

    Compaction's measured win (+49%, pallas/README.md table) applies to
    spread-chord rig sources; uniform-chord scenes see no gain and 8
    buckets over-fragment.  This gates k=4 on the p90/p10 chord spread of a
    CONCRETE probe batch (host-side, at trace-closure build time).  The
    spread is a ratio, so any cubic volume of extent ``vol_span`` gives the
    same answer regardless of resolution.  ANRT_BUCKETED still overrides in
    both directions.
    """
    spread = chord_spread((2, 2, 2), vol_span, x, v, ds)
    return k if spread >= threshold else 0


def trace_bucketed(rif, x, v, h, ds, nbuckets: int = 4):
    """``tracer.trace`` with exit-step compaction; same outputs/gradients.

    K static equal-size buckets in chord order; the pad-free split is exact
    because bucketing only permutes rows.  nbuckets=1 degenerates to trace.
    """
    n = x.shape[0]
    if nbuckets <= 1 or n % nbuckets:
        return api.trace(rif, x, v, h, ds)
    order = jnp.argsort(chord_steps(rif.shape, h, x, v, ds))
    xs = jnp.take(x, order, axis=0)
    vs = jnp.take(v, order, axis=0)
    size = n // nbuckets
    xts, vts = [], []
    for b in range(nbuckets):
        s = slice(b * size, (b + 1) * size)
        xt_b, vt_b = api.trace(rif, xs[s], vs[s], h, ds)
        xts.append(xt_b)
        vts.append(vt_b)
    inv = jnp.argsort(order)
    xt = jnp.take(jnp.concatenate(xts), inv, axis=0)
    vt = jnp.take(jnp.concatenate(vts), inv, axis=0)
    return xt, vt

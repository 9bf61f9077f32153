"""Shared experiment-driver plumbing.

Each driver mirrors its reference twin (core/*_opt.py): a params dict with
the same keys, a loss over freshly generated rays each iteration, the
multires Adam loop.  Differences by design:

* randomness flows through explicit PRNG keys (params['seed']),
* rejected/cropped rays are masked, not dropped (static shapes),
* ``autodiff`` switches between the constant-memory adjoint (`tracer.trace`)
  and plain autodiff through the scan forward (`tracer.trace_ad`) — the same
  cross-validation toggle as the reference's ADTracerC/BackTracerC,
* ``mesh=True`` runs the trace/adjoint sharded over all devices
  (parallel/mesh.py) with rays padded to the shard count.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracer
from ..parallel import mesh as pmesh
from ..tracer import compaction


def masked_mean_sq(diff, mask):
    """sum(mask * diff^2) / count(mask): the masked analog of dropping rows."""
    m = mask.astype(diff.dtype)
    if diff.ndim == 2:
        m = m[:, None]
    return jnp.sum(m * diff ** 2) / jnp.maximum(jnp.sum(mask), 1)


def masked_sum_sq(diff, mask):
    m = mask.astype(diff.dtype)
    if diff.ndim == 2:
        m = m[:, None]
    return jnp.sum(m * diff ** 2)


def make_trace(vol_span, ds, autodiff=False, use_mesh=False, res=None,
               gradient=None, seg=32, probe_rays=None):
    """Volume trace closure: h is derived from the *current* grid resolution
    (luneburg_opt.py:85-89) while ds stays fixed from the finest one.

    ``gradient`` selects the differentiation strategy:
      - "adjoint" (default): O(1)-memory reverse re-integration
      - "exact": checkpointed-segment adjoint (tracer.trace_exact) — exact
        discrete gradients at any precision, O(N*(steps/seg+seg)) memory
      - "ad": plain autodiff through the scan forward (tape analog)
      - a mutable dict ``{"mode": <one of the above>}``, read at trace time —
        the hook used by stage-level auto-escalation (the per-stage spotcheck
        flips the mode to "exact" when adjoint drift exceeds tolerance; the
        next stage's jit retrace picks it up)
    ``autodiff=True`` is the reference-style alias for "ad".

    ``probe_rays``: a concrete (x, v) sample of the run's source — enables
    exit-step compaction by default when the source's chord spread exceeds
    the measured win threshold (VERDICT r4 #8; +49% on spread-chord rig
    scenes, pallas/README.md).  ANRT_BUCKETED overrides in both directions.
    """
    if gradient is None:
        gradient = "ad" if autodiff else "adjoint"
    the_mesh = pmesh.make_ray_mesh() if use_mesh else None
    cache = {}
    env_buckets = os.environ.get("ANRT_BUCKETED")
    if env_buckets is not None:
        default_buckets = int(env_buckets)
    elif probe_rays is not None:
        default_buckets = compaction.auto_buckets(
            vol_span, jnp.asarray(probe_rays[0]), jnp.asarray(probe_rays[1]),
            ds)
    else:
        default_buckets = 0

    def _pad_call(fn, nt, x, v):
        # pad the ray axis to the device count with COPIES of ray 0:
        # identical dynamics (no effect on fwd/bwd early exit) and the
        # sliced-off cotangents are zero, so gradients are unaffected
        n = x.shape[0]
        ndev = the_mesh.devices.size
        if n % ndev:
            pad = (-n) % ndev
            xpad = jnp.tile(x[:1], (pad, 1))
            vpad = jnp.tile(v[:1], (pad, 1))
            xt, vt = fn(nt, jnp.concatenate([x, xpad]),
                        jnp.concatenate([v, vpad]))
            return xt[:n], vt[:n]
        return fn(nt, x, v)

    def trace(nt, x, v):
        h = vol_span / max(nt.shape[0] - 1, 1)
        mode = gradient["mode"] if isinstance(gradient, dict) else gradient
        if mode is None:
            mode = "adjoint"
        if mode == "ad":
            return tracer.trace_ad(nt, x, v, h, ds)
        if mode == "exact":
            if the_mesh is not None:
                key = ("exact", nt.shape[0], float(h))
                if key not in cache:
                    cache[key] = pmesh.make_sharded_trace_exact(
                        the_mesh, h, ds, max(nt.shape), seg=seg)
                return _pad_call(cache[key], nt, x, v)
            return tracer.trace_exact(nt, x, v, h, ds, seg)
        nbuckets = default_buckets
        if nbuckets > 1 and the_mesh is None:
            # exit-step compaction (tracer/compaction.py): same outputs and
            # gradients, +49% measured on spread-chord rig scenes, no gain on
            # uniform-chord ones — opt-in per run (pallas/README.md table)
            return compaction.trace_bucketed(nt, x, v, h, ds, nbuckets)
        if the_mesh is not None:
            # nbuckets > 1: per-shard compaction inside shard_map — each
            # shard sorts its own rays by chord and buckets its while_loops
            # (VERDICT r3 #5; falls back when the shard is indivisible)
            key = (nt.shape[0], float(h), nbuckets)
            if key not in cache:
                cache[key] = pmesh.make_sharded_trace(
                    the_mesh, h, ds, max(nt.shape), nbuckets=nbuckets)
            return _pad_call(cache[key], nt, x, v)
        return tracer.trace(nt, x, v, h, ds)

    return trace


def gradient_spotcheck(eta, x, v, vol_span, ds, mask=None, n_rays=2048,
                       metrics=None, name="grad_spotcheck", perturb=True,
                       perturb_amp=0.05):
    """One-shot adjoint-vs-exact gradient comparison on this run's scene.

    The constant-memory adjoint re-integrates trajectories in reverse; at
    float32 its gradient drifts on rough fields (tracer/api.py precision
    note).  Every experiment run calls this once at startup on a subsample
    of its real rays so drift on a *given* scene is measured, not assumed
    (VERDICT r1 item 9).  Returns the max relative deviation and logs it.

    ``perturb`` adds a smooth gaussian bump of amplitude ``perturb_amp``
    (default 5%) so the check exercises curvature even when the initial
    field is flat.  Pass an amplitude representative of the run's actual
    field deviation — drift grows with ray curvature, so a 5% bump wildly
    overestimates drift for weak-signal scenes like fuel injection
    (signal 3e-4; rays through a constant
    field bend nowhere and would hide any drift).
    """
    x = x[:n_rays]
    v = v[:n_rays]
    m = None if mask is None else mask[:n_rays]
    if perturb and eta.shape[0] >= 2:
        r = eta.shape[0]
        ax = jnp.linspace(-1.0, 1.0, r, dtype=eta.dtype)
        zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
        eta = eta + perturb_amp * jnp.exp(-(xx ** 2 + yy ** 2 + zz ** 2) / 0.18)
    h = vol_span / max(eta.shape[0] - 1, 1)

    def probe_loss(trace_fn):
        def f(nt):
            xt, vt = trace_fn(nt, x, v, h, ds)
            per = jnp.sum(xt ** 2 + xt * vt, axis=-1)
            if m is not None:
                per = jnp.where(m, per, 0.0)
            return jnp.sum(per)
        return f

    g_adj = jax.grad(probe_loss(tracer.trace))(eta)
    g_ex = jax.grad(probe_loss(
        lambda nt, x, v, h, ds: tracer.trace_exact(nt, x, v, h, ds)))(eta)
    scale = jnp.maximum(jnp.max(jnp.abs(g_ex)), 1e-30)
    rel = float(jnp.max(jnp.abs(g_adj - g_ex)) / scale)
    l2 = float(jnp.linalg.norm((g_adj - g_ex).reshape(-1))
               / jnp.maximum(jnp.linalg.norm(g_ex.reshape(-1)), 1e-30))
    cos = float(jnp.vdot(g_adj, g_ex)
                / jnp.maximum(jnp.linalg.norm(g_adj.reshape(-1))
                              * jnp.linalg.norm(g_ex.reshape(-1)), 1e-30))
    if metrics is not None:
        metrics.log(0, **{name: rel, name + "_rel_l2": l2,
                          name + "_cos": cos})
    if rel > 1e-2:
        import warnings
        warnings.warn(
            f"adjoint gradient deviates {rel:.2e} (rel, max-norm; rel-L2 "
            f"{l2:.2e}, cosine {cos:.4f}) from the checkpointed-exact "
            "gradient on this scene; consider gradient='exact' or float64 "
            "(tracer/api.py precision note)")
    return dict(max_rel=rel, rel_l2=l2, cos=cos)


def exact_mem_bytes(n_rays, res, vol_span, ds, seg=32):
    """Checkpoint + replay footprint of trace_exact for one batch.

    ckpts: (nseg, N, 7) f32; replay emits (seg, N, 3) + (seg, N) plus the
    (seg, N, 6) carry class — bounded here as seg*N*10 floats.  N is capped
    at ANRT_EXACT_CHUNK: larger batches are microbatched along the ray axis
    (tracer/checkpointed.py), so the footprint no longer grows with batch
    size (the r4 crash envelope is closed)."""
    from ..tracer.checkpointed import _exact_chunk_rays

    chunk = _exact_chunk_rays()
    if chunk:
        n_rays = min(n_rays, chunk)
    h = vol_span / max(res - 1, 1)
    steps = tracer.max_steps_fwd(res, h, ds)
    nseg = -(-steps // seg)
    return 4 * n_rays * (nseg * 7 + seg * 10)


def make_stage_escalator(holder, vol_span, ds, probe_rays, metrics=None,
                         tol=None, n_rays=2048, rays_per_iter=None):
    """Stage-level gradient auto-escalation (VERDICT r3 #3).

    Returns a ``stage_fn`` for :func:`opt.multires_opt`: at the start of each
    resolution stage it re-runs the adjoint-vs-exact spotcheck on the
    *current* field (drift grows with resolution and field roughness — the
    startup spotcheck on the coarse init can pass while the 129^3 stage
    drifts 65%, results/einstein_turing_128) and flips ``holder['mode']`` to
    ``"exact"`` when the rel-L2 deviation exceeds ``tol`` (ANRT_EXACT_TOL,
    default 0.01).  The stage's fresh jit retrace picks up the new mode.

    ``probe_rays`` is a callable ``() -> (x, v, mask)`` sampling this run's
    real source distribution.
    """
    if tol is None:
        tol = float(os.environ.get("ANRT_EXACT_TOL", "0.01"))
    # (the r4 ANRT_EXACT_MEM_MB refusal guard is gone: the exact path now
    # microbatches the ray axis internally — ANRT_EXACT_CHUNK,
    # tracer/checkpointed.py — so its memory is bounded at any batch size
    # and escalation is always safe)

    def stage_fn(stage, n):
        if holder.get("mode") not in (None, "adjoint"):
            return  # already escalated / explicitly chosen
        if stage == 0:
            return  # startup spotcheck covers the first stage
        x, v, mask = probe_rays()
        stats = gradient_spotcheck(
            n, x, v, vol_span, ds, mask=mask, n_rays=n_rays, metrics=metrics,
            name=f"grad_spotcheck_stage{stage}", perturb=False)
        if stats["rel_l2"] > tol:
            import warnings
            holder["mode"] = "exact"
            warnings.warn(
                f"stage {stage} (res {n.shape[0]}): adjoint gradient rel-L2 "
                f"drift {stats['rel_l2']:.2e} > {tol:g}; escalating to the "
                "checkpointed-exact gradient for the remaining stages")
            if metrics is not None:
                metrics.log(0, gradient_escalated_stage=stage,
                            gradient_mode="exact")

    return stage_fn


def per_view_planes(planes, rpv):
    """First-plane-per-view sensor list (luneburg_opt.py:70-78).

    rpv entries are equal static counts; returns lists of (1,3) arrays.
    """
    sensor_p, sensor_n, sensor_t = [], [], []
    offset = 0
    for count in rpv:
        sensor_p.append(planes[None, offset, 0, :])
        sensor_n.append(planes[None, offset, 1, :])
        sensor_t.append(planes[None, offset, 2, :])
        offset += count
    return sensor_p, sensor_n, sensor_t


def split_views(arr, rpv):
    """Static split of a concatenated per-view array."""
    out = []
    offset = 0
    for count in rpv:
        out.append(arr[offset:offset + count])
        offset += count
    return out

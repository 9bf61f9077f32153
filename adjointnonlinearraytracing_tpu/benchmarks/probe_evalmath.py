"""Probe: is the factorized window eval/contrib math VPU-bound or
utilization-bound?  (round 4; the last single-chip lever after the scatter
negative results)

Round-3 HLO attribution put the non-gather/scatter "math" at ~970 ms of the
2.19 s bench iteration — fwd eval 336 ms, bwd eval reduces 396 ms, contrib
build 297 ms.  A lane-op count of the factorized z->y->x contraction says
~0.14 ms/pair at full (8,128) VPU utilization vs the measured ~2.6 ms —
18x above the op bound.  Hypothesis: the narrow intermediates ((N,25),
(N,5), (N,1)) waste 103-127 of every 128 lanes.

Cases, each in-loop (while_loop, evolving inputs, host-sync):

  A. XLA eval_window_fac           — the production forward eval
  B. XLA eval_bwd + contrib        — the production backward math
  C. Pallas fused eval             — same math, (BLK,128) tiles resident in
                                     VMEM, all intermediates kernel-local
  D. lane-op lower bound           — the same number of (N,125) elementwise
                                     passes with no narrow shapes (what the
                                     VPU would do at full width)

If C ~= A, XLA's fusion already achieves kernel-grade locality and the math
is genuinely VPU/layout-bound -> no headroom without an algorithm change.
If C << A, a production Pallas eval is the next bench lever.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fields import windows as WD

N = 1 << 18
STEPS = 64
_W = 5
_LANES = 125
_ROW = 128


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def timeit(name, fn, argsets, per=None):
    _sync(fn(*argsets[0]))
    times = []
    for a in argsets[1:]:
        t0 = time.perf_counter()
        _sync(fn(*a))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:40s} {dt / STEPS * 1e3:8.2f} ms/step"
          f"  {dt / (N * STEPS) * 1e9:6.2f} ns/ray", flush=True)
    return dt


def xla_eval_case(h=1.0):
    def fn(W, off3, w0):
        acc = jnp.zeros((N,), jnp.float32)
        acc3 = jnp.zeros((N, 3), jnp.float32)

        def body(s):
            i, acc, acc3, off3_, w0_ = s
            n, g = WD.eval_window_fac(W, off3_, w0_, h)
            # evolve inputs cheaply so dispatches are distinct
            w0_ = jnp.mod(w0_ + 0.37, 1.0)
            off3_ = jnp.mod(off3_ + 1, 3)
            return i + 1, acc + n, acc3 + g, off3_, w0_

        _, acc, acc3, _, _ = lax.while_loop(
            lambda s: s[0] < STEPS, body, (0, acc, acc3, off3, w0))
        return acc, acc3
    return jax.jit(fn)


def xla_bwd_case(h=1.0):
    def fn(W, off3, w0, mu):
        acc = jnp.zeros((N, _ROW), jnp.float32)

        def body(s):
            i, acc, off3_, w0_ = s
            n, g, hess, ctx = WD.eval_bwd(W, off3_, w0_, h)
            dn = jnp.einsum("nd,nd->n", mu, g)
            dnx = n[:, None] * mu
            cw = WD.contrib(ctx, dn, dnx, h)
            w0_ = jnp.mod(w0_ + 0.37, 1.0)
            off3_ = jnp.mod(off3_ + 1, 3)
            return i + 1, acc + cw, off3_, w0_

        _, acc, _, _ = lax.while_loop(
            lambda s: s[0] < STEPS, body, (0, acc, off3, w0))
        return acc
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Pallas fused eval: (BLK, 128) tiles, intermediates in registers/VMEM
# ---------------------------------------------------------------------------

BLK = 512


def _pl_eval_kernel(W_ref, off_ref, n_ref):
    A = W_ref[...]                      # (BLK, 128) f32
    offs = off_ref[...]                 # (BLK, 8) f32: ox,oy,oz,w0x,w0y,w0z
    ox = offs[:, 0:1]
    oy = offs[:, 1:2]
    oz = offs[:, 2:3]
    w0x = offs[:, 3:4]
    w0y = offs[:, 4:5]
    w0z = offs[:, 5:6]

    def contract(A, off, w0, blk):
        # select sub-blocks off and off+1 of size blk
        sel0 = jnp.zeros_like(A[:, :blk])
        sel1 = jnp.zeros_like(A[:, :blk])
        for k in range(_W - 1):
            m = off == k
            sel0 = jnp.where(m, A[:, k * blk:(k + 1) * blk], sel0)
            sel1 = jnp.where(m, A[:, (k + 1) * blk:(k + 2) * blk], sel1)
        d = sel1 - sel0
        return sel0 + w0 * d, d

    Wz, Dz = contract(A, oz, w0z, 25)
    Wzy, WzDy = contract(Wz, oy, w0y, 5)
    Dzy, _ = contract(Dz, oy, w0y, 5)
    nI, nD = contract(Wzy, ox, w0x, 1)
    gyI, _ = contract(WzDy, ox, w0x, 1)
    gzI, _ = contract(Dzy, ox, w0x, 1)

    out = jnp.concatenate([nI, nD, gyI, gzI], axis=1)  # (BLK, 4)
    n_ref[...] = jnp.pad(out, ((0, 0), (0, _ROW - 4)))


def pallas_eval_case(interpret=False):
    from jax.experimental import pallas as pl

    def call(W, offpack):
        return pl.pallas_call(
            _pl_eval_kernel,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, _ROW), lambda i: (i, 0)),
                pl.BlockSpec((BLK, 8), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BLK, _ROW), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, _ROW), jnp.float32),
            interpret=interpret,
        )(W, offpack)

    def fn(W, offpack):
        def body(s):
            i, acc, offpack_ = s
            out = call(W, offpack_)
            acc = acc + out[:, :4]
            off_new = jnp.floor(jnp.mod(offpack_[:, :3] + 1.0, 3.0))
            w_new = jnp.mod(offpack_[:, 3:6] + 0.37, 1.0)
            offpack_ = jnp.concatenate(
                [off_new, w_new, offpack_[:, 6:]], axis=1)
            return i + 1, acc, offpack_

        acc = jnp.zeros((N, 4), jnp.float32)
        _, acc, _ = lax.while_loop(lambda s: s[0] < STEPS, body,
                                   (0, acc, offpack))
        return acc
    return jax.jit(fn)


def lane_bound_case(passes=6):
    """D: `passes` full-width elementwise passes over (N,125) — the cost the
    VPU would pay for the same data touched at full lane utilization."""
    def fn(W, off3, w0):
        acc = jnp.zeros((N,), jnp.float32)

        def body(s):
            i, acc, W_ = s
            x = W_
            for _ in range(passes):
                x = x * 1.0001 + 0.1
            acc = acc + jnp.sum(x[:, :8], axis=1)
            W_ = W_ * 0.9999
            return i + 1, acc, W_

        _, acc, _ = lax.while_loop(lambda s: s[0] < STEPS, body,
                                   (0, acc, W))
        return acc
    return jax.jit(fn)


def check_pallas_correctness():
    """Interpret-mode vs eval_window_fac on small shapes (CPU-runnable)."""
    from jax.experimental import pallas as pl

    n = BLK
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (n, _ROW), jnp.float32)
    off3 = jax.random.randint(jax.random.fold_in(key, 1), (n, 3), 0, 4)
    w0 = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    offpack = jnp.concatenate(
        [off3.astype(jnp.float32), w0, jnp.zeros((n, 2), jnp.float32)],
        axis=1)

    out = pl.pallas_call(
        _pl_eval_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((n, _ROW), lambda i: (i, 0)),
                  pl.BlockSpec((n, 8), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((n, _ROW), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, _ROW), jnp.float32),
        interpret=True,
    )(W, offpack)
    n_ref, g_ref = WD.eval_window_fac(W, off3, w0, 1.0)
    err_n = float(jnp.abs(out[:, 0] - n_ref).max())
    err_gx = float(jnp.abs(out[:, 1] - g_ref[:, 0]).max())
    err_gy = float(jnp.abs(out[:, 2] - g_ref[:, 1]).max())
    err_gz = float(jnp.abs(out[:, 3] - g_ref[:, 2]).max())
    print(f"pallas-vs-fac max err: n {err_n:.2e} gx {err_gx:.2e} "
          f"gy {err_gy:.2e} gz {err_gz:.2e}", flush=True)
    return max(err_n, err_gx, err_gy, err_gz) < 1e-5


def main():
    key = jax.random.PRNGKey(0)

    def argsets(n=3, with_mu=False, packed=False):
        sets = []
        for i in range(n + 1):
            ks = jax.random.split(jax.random.fold_in(key, i), 4)
            W = jax.random.normal(ks[0], (N, _ROW), jnp.float32)
            off3 = jax.random.randint(ks[1], (N, 3), 0, 4)
            w0 = jax.random.uniform(ks[2], (N, 3), jnp.float32)
            if packed:
                offpack = jnp.concatenate(
                    [off3.astype(jnp.float32), w0,
                     jnp.zeros((N, 2), jnp.float32)], axis=1)
                sets.append((W, offpack))
            elif with_mu:
                mu = jax.random.normal(ks[3], (N, 3), jnp.float32)
                sets.append((W, off3, w0, mu))
            else:
                sets.append((W, off3, w0))
        return sets

    ok = check_pallas_correctness()
    print("pallas correctness:", ok, flush=True)

    timeit("A XLA eval_window_fac", xla_eval_case(), argsets())
    timeit("B XLA eval_bwd + contrib", xla_bwd_case(), argsets(with_mu=True))
    if ok:
        try:
            timeit("C Pallas fused eval", pallas_eval_case(),
                   argsets(packed=True))
        except Exception as e:  # Mosaic feature gaps surface here
            print(f"C Pallas fused eval: FAILED TO COMPILE/RUN: {e!r}",
                  flush=True)
    timeit("D lane-op bound (6 full-width passes)", lane_bound_case(),
           argsets())


if __name__ == "__main__":
    main()

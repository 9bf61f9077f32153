"""Probe: pipelined per-row DMA gather (Pallas) vs XLA's row gather.

pallas/README.md round-2/3 finding: XLA lowers `table[idx]` (N row gathers
from an (R, 128) f32 table) to a serial per-row loop at ~14 ns/row — about
6% of HBM bandwidth for 512-byte rows; the bound is per-row DMA *latency*
with ~1 DMA in flight, not bytes.  The hypothesised fix is a Pallas kernel
that keeps SLOTS row-DMAs in flight with a semaphore ring
(`pltpu.make_async_copy(table.at[idx[i]], out.at[i], sem.at[i % SLOTS])`).
The open question (README "Implications" #2) is the scalar-issue cost per
DMA start: if it exceeds ~14 ns the ring cannot beat XLA regardless of
flight depth.

This probe measures exactly that, standalone:
  * XLA baseline:   jnp.take(table, idx, axis=0) per dispatch
  * Pallas ring:    grid over N/CHUNK blocks; per block the (CHUNK,) index
    slice arrives in SMEM (BlockSpec memory_space=SMEM), the table stays in
    HBM (memory_space=ANY), and the kernel issues CHUNK row DMAs
    HBM->VMEM-out with SLOTS in flight.

Methodology per pallas/README.md: K distinct index arrays (one per timed
dispatch, so the axon backend cannot dedup), sync via float(jnp.sum(...)).

Usage:  python -m adjointnonlinearraytracing_tpu.benchmarks.probe_dma_gather
Env:    PROBE_R (table rows, default 287496 = 66^3), PROBE_N (rows gathered,
        default 262144), PROBE_CHUNK (default 2048), PROBE_SLOTS (default 8),
        PROBE_REPS (default 8), PROBE_INTERPRET=1 (CPU interpreter, tiny
        sizes, correctness only).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(os.environ.get("PROBE_INTERPRET"))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")

LANES = 128


def _ring_kernel(idx_ref, table_ref, out_ref, sems, *, chunk, slots):
    """Gather rows table[idx[i]] -> out[i] with `slots` DMAs in flight."""

    def copy(i):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[i], 1), :],
            out_ref.at[pl.ds(i, 1), :],
            sems.at[lax.rem(i, slots)],
        )

    def body(i, _):
        copy(i).start()

        @pl.when(i >= slots)
        def _():
            copy(i - slots).wait()

        return 0

    lax.fori_loop(0, chunk, body, 0)

    def drain(j, _):
        copy(chunk - slots + j).wait()
        return 0

    lax.fori_loop(0, min(slots, chunk), drain, 0)


def dma_gather(table, idx, *, chunk, slots):
    n = idx.shape[0]
    assert n % chunk == 0, (n, chunk)
    kernel = functools.partial(_ring_kernel, chunk=chunk, slots=slots)
    return pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((chunk, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, LANES), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((slots,))],
        interpret=INTERPRET,
    )(idx, table)


def _sync(x):
    return float(jnp.sum(x))


def main():
    R = int(os.environ.get("PROBE_R", 66 ** 3))
    N = int(os.environ.get("PROBE_N", 262144))
    CHUNK = int(os.environ.get("PROBE_CHUNK", 2048))
    SLOTS = int(os.environ.get("PROBE_SLOTS", 8))
    REPS = int(os.environ.get("PROBE_REPS", 8))
    if INTERPRET:
        R, N, CHUNK, SLOTS, REPS = 97, 256, 64, 4, 2

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, LANES), jnp.float32)
    idxs = [jax.random.randint(jax.random.PRNGKey(i + 1), (N,), 0, R,
                               jnp.int32) for i in range(REPS)]

    xla_gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    pl_gather = jax.jit(functools.partial(dma_gather, chunk=CHUNK,
                                          slots=SLOTS))

    # correctness first (also warms both executables)
    a = xla_gather(table, idxs[0])
    b = pl_gather(table, idxs[0])
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max|xla - pallas| = {err:.2e}  (R={R}, N={N}, chunk={CHUNK}, "
          f"slots={SLOTS})")
    assert err == 0.0, err
    if INTERPRET:
        print("interpret-mode correctness OK")
        return

    for name, fn in [("xla", xla_gather), ("pallas_ring", pl_gather)]:
        _sync(fn(table, idxs[-1]))  # warm
        t0 = time.perf_counter()
        for i in range(REPS):
            _sync(fn(table, idxs[i]))
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:12s}  {dt * 1e3:8.2f} ms/dispatch   "
              f"{dt / N * 1e9:6.1f} ns/row   "
              f"{N * LANES * 4 / dt / 1e9:6.1f} GB/s")


if __name__ == "__main__":
    main()

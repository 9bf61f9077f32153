"""Profiling helpers: jax.profiler traces + wall-clock timing with real sync.

The reference hand-rolls std::chrono + cuda_mem_get_info (src/test.cpp); the
TPU equivalents are jax.profiler traces (viewable in TensorBoard/Perfetto)
and block-until-result timing.  NOTE: on remote-execution backends
`block_until_ready` may return before the device finishes — `timeit` forces a
scalar readback, which is authoritative everywhere.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def force(x) -> float:
    """Force materialization; returns a scalar checksum."""
    leaves = jax.tree_util.tree_leaves(x)
    total = 0.0
    for leaf in leaves:
        total += float(jnp.sum(leaf))
    return total


def timeit(fn, *args, iters: int = 3, warmup: int = 1):
    """Median-free mean wall time per call with forced readback."""
    for _ in range(warmup):
        force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        force(fn(*args))
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (open in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_gb():
    """Peak device memory when the backend exposes stats (else None)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get("peak_bytes_in_use", 0) / 1e9
    except Exception:
        pass
    return None

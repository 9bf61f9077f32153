"""Multi-host initialization and process-level helpers.

The reference is single-process/single-GPU; this framework scales over TPU
pod slices: call :func:`initialize` once per host process before any jax
computation, then build the ray mesh over ``jax.devices()`` (all global
devices) — rays shard across hosts over DCN and across chips over ICI, the
voxel-gradient psum is a standard XLA collective (parallel/mesh.py).

Each host generates/owns its local ray shard: use :func:`local_ray_slice`
to carve the per-host portion of a globally-seeded batch so every host does
O(global/N) source-generation work, and `jax.make_array_from_process_local_data`
to assemble the global sharded array.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """`jax.distributed.initialize` wrapper; no-op on single-process runs.

    On TPU pods the three arguments are auto-detected from the environment;
    on CPU/GPU fleets pass them explicitly.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_info():
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count(),
                local_devices=len(jax.local_devices()),
                global_devices=len(jax.devices()))


def local_ray_slice(n_global: int, n_shards: Optional[int] = None):
    """This host's contiguous ray range of the pad-and-mask global batch.

    The global batch is padded up to a multiple of ``n_shards`` (default:
    the global device count, so per-host slices stay divisible by the local
    device count and shard cleanly onto the ray mesh) and split evenly
    across processes.  Returns ``(start, stop, n_valid)``: every host
    generates exactly ``stop - start`` rays; rays with global index >=
    ``n_global`` — the trailing pad — must be masked inactive (same
    pad-and-mask convention as parallel.mesh.pad_rays), and ``n_valid`` is
    how many of this host's rays are real.
    """
    pc = jax.process_count()
    pi = jax.process_index()
    if n_shards is None:
        n_shards = len(jax.devices())
    n_shards = max(n_shards, pc)
    padded = -(-n_global // n_shards) * n_shards
    per = padded // pc
    start, stop = pi * per, (pi + 1) * per
    n_valid = max(0, min(stop, n_global) - start)
    return start, stop, n_valid


def global_ray_array(mesh, local_arrays):
    """Assemble per-host ray shards into global sharded arrays.

    ``local_arrays``: list of host-local numpy/jax arrays whose axis 0 is the
    local ray shard.  Returns arrays sharded P('rays', ...) over ``mesh``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = []
    for a in local_arrays:
        spec = P("rays", *([None] * (np.ndim(a) - 1)))
        out.append(jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(a)))
    return out

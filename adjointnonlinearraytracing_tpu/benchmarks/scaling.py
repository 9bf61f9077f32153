"""Ray-parallel scaling sweep over an n-device mesh.

Measures rays/s of the full fwd+adjoint step at 1, 2, 4, ... devices with the
ray count scaled proportionally (weak scaling), reporting parallel
efficiency.  On a real pod slice this exercises ICI; under
``--xla_force_host_platform_device_count`` it validates the mechanism and
gives an indicative number on CPU threads.  NOTE: virtual CPU devices
share the same physical cores, so CPU "efficiency" mostly measures thread
contention — real scaling numbers require real chips (ROADMAP.md).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
     python -m adjointnonlinearraytracing_tpu.benchmarks.scaling
"""

from __future__ import annotations

import json
import time

import numpy as np


def profile_scaling(res=17, rays_per_device=1 << 12, iters=2, span=20.0):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..parallel.mesh import make_sharded_trace
    from .sweeps import _case

    devices = jax.devices()
    h = span / (res - 1)
    ds = h / 2
    rows = []
    n_dev_list = [n for n in [1, 2, 4, 8, 16, 32] if n <= len(devices)]
    base = None
    for n_dev in n_dev_list:
        mesh = Mesh(np.asarray(devices[:n_dev]), ("rays",))
        nrays = rays_per_device * n_dev
        rif, x0, v0, _ = _case(res, nrays, span)
        x0 = jax.device_put(x0, NamedSharding(mesh, P("rays", None)))
        v0 = jax.device_put(v0, NamedSharding(mesh, P("rays", None)))
        rif = jax.device_put(rif, NamedSharding(mesh, P()))

        traced = make_sharded_trace(mesh, h, ds, res)

        @jax.jit
        def fwd_bwd(r, x, v):
            def loss(rr):
                xt, vt = traced(rr, x, v)
                return jnp.sum(xt ** 2)

            return jax.grad(loss)(r)

        out = fwd_bwd(rif, x0, v0)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd_bwd(rif, x0, v0)
            _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        rps = nrays / dt
        if base is None:
            base = rps
        row = dict(devices=n_dev, rays=nrays, time_s=round(dt, 4),
                   rays_per_s=round(rps, 1),
                   efficiency=round(rps / (base * n_dev), 3))
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    profile_scaling()

"""The canonical benchmark/entry-point scene: a smooth Gaussian refractive
bump with slightly tilted upward rays.

Single source of truth for bench.py, benchmarks/sweeps.py and
__graft_entry__.py so recorded BASELINE/BENCH numbers stay comparable across
rounds (a scene change here is a deliberate, visible event).
"""

from __future__ import annotations

import numpy as np


def build_case(res=128, nrays=1 << 18, span=20.0, dtype="float32", seed=0):
    """(rif (res^3), x0 (N,3), v0 (N,3), span) on the default device."""
    import jax.numpy as jnp

    idx = np.arange(res) * (span / (res - 1))
    z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
    c = span / 2
    r2 = (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
    rif = jnp.asarray(1.0 + 0.2 * np.exp(-r2 / (2 * (span / 4) ** 2)), dtype)

    rng = np.random.default_rng(seed)
    xz = rng.uniform(0.2 * span, 0.8 * span, (nrays, 2))
    x0 = np.stack([xz[:, 0], -0.25 * np.ones(nrays) * span / res, xz[:, 1]],
                  axis=-1)
    tilt = 0.08 * rng.standard_normal((nrays, 2))
    v0 = np.stack([tilt[:, 0], np.ones(nrays), tilt[:, 1]], axis=-1)
    v0 /= np.linalg.norm(v0, axis=-1, keepdims=True)
    return rif, jnp.asarray(x0, dtype), jnp.asarray(v0, dtype), span

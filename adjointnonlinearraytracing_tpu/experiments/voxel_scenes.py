"""Ground-truth volume loaders.

The reference's fuel-injection driver imports a ``voxel_scenes`` module that
is absent from its repo (core/fuel_injection_opt.py:38; SURVEY.md §2.2) — we
supply it: the loader for data/fuel_injection_64.npy (64^3 float64 in
[1.0, 1.0003]) plus simple synthetic scenes used by tests and demos.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def data_path(name: str) -> str:
    return os.path.abspath(os.path.join(_DATA_DIR, name))


def load_fuel_injection() -> np.ndarray:
    """The 64^3 fuel-injection gas-density volume (values in [1, 1.0003])."""
    return np.load(data_path("fuel_injection_64.npy"))


def to_jax(arr: np.ndarray, dtype=jnp.float32):
    return jnp.asarray(arr, dtype=dtype)


def fuel_injection_rif(fuel_val: float = 0.0003, dtype=jnp.float32):
    """The padded 65^3 refractive-index GT used by the experiment
    (core/fuel_injection_opt.py:38-43): ``n = (1+fuel_val) - fuel_val*density``
    with a normalized fuel density in [0, 1], padded to 65^3 with the
    background value 1+fuel_val.

    The shipped npy is already that rescaled RIF at fuel_val=3e-4: every
    face/corner sits at exactly 1.0003 (the background) and the plume dips
    toward 1.0 — precisely the output range of the reference's rescale
    formula.  The reference applies the formula to the output of its *lost*
    ``voxel_scenes.load_fuel_injection()`` (core/fuel_injection_opt.py:38),
    which therefore must have returned the normalized density.  We recover
    the density from the npy and re-apply the rescale so ``fuel_val`` stays
    a parameter.  (Feeding the npy through the formula twice — as this
    loader did before round 3 — collapses the plume to a ~1e-7 perturbation
    at the f32 noise floor and makes the tomography unsolvable.)
    """
    g = load_fuel_injection()
    density = (g.max() - g) / (g.max() - g.min())  # in [0, 1], 1 = max fuel
    n = (1.0 + fuel_val) - fuel_val * density
    out = np.full((65, 65, 65), 1.0 + fuel_val, dtype=np.float64)
    out[:-1, :-1, :-1] = n
    return jnp.asarray(out, dtype=dtype)


def luneburg_lens(res: int, span: float, dtype=jnp.float32):
    """Closed-form Luneburg profile n(r) = sqrt(2 - (r/R)^2) on a grid whose
    lens fills the volume (radius span/2), background 1."""
    idx = np.arange(res) * (span / (res - 1))
    z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
    c = span / 2
    r2 = ((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) / (c ** 2)
    n = np.where(r2 <= 1.0, np.sqrt(np.clip(2.0 - r2, 0.0, None)), 1.0)
    return jnp.asarray(n, dtype=dtype)


def gaussian_bump(res: int, span: float, amp: float = 0.1, dtype=jnp.float32):
    """Smooth centered bump — handy synthetic GT for tests/benchmarks."""
    idx = np.arange(res) * (span / (res - 1))
    z, y, x = np.meshgrid(idx, idx, idx, indexing="ij")
    c = span / 2
    r2 = (x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2
    sigma = span / 4
    return jnp.asarray(1.0 + amp * np.exp(-r2 / (2 * sigma ** 2)), dtype=dtype)

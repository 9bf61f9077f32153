"""Test harness config: force an 8-device virtual CPU platform.

The container's sitecustomize registers the axon TPU backend and overrides
the JAX_PLATFORMS env var, so we must override via jax.config *after* import.
Sharding tests use the 8 virtual CPU devices; everything else runs on CPU —
the real chip is reserved for bench.py.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Math-validation tests run in float64 on CPU for tight tolerances; the
# package itself is dtype-polymorphic (bench/TPU paths run float32).
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full-depth suite)")


def pytest_collection_modifyitems(config, items):
    """Tests marked ``slow`` (each >20 s, pure extra depth over a fast twin)
    skip unless --runslow / -m slow is given.  Measured wall time of the
    default suite on the round-3 box: see tests/README_RUNTIME.md (a single
    serial ``pytest tests/ -q`` takes tens of minutes on CPU; per-file
    ``pytest -p xdist -n auto`` or per-directory runs are the practical
    loop)."""
    if config.getoption("--runslow") or "slow" in config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

"""Worker process for the 2-process multi-host test (and CI-runnable demo).

Usage:  python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices (8 global across 2 processes),
generates its local slice of a globally-seeded ray batch, assembles global
sharded arrays, runs the sharded differentiable trace (forward + adjoint +
cross-process psum over Gloo), and checks the voxel gradient against the
single-process unsharded reference computed locally from the full batch.

Prints ``MULTIHOST_OK <process_id> <max_rel_err>`` on success (exit 0).

This is the SURVEY.md §2.3 multi-host row made executable without TPU pods:
rays shard across processes over the (here: Gloo/TCP, on pods: DCN)
transport and across local devices, the gradient all-reduce is the same
single psum that rides ICI on real slices.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from adjointnonlinearraytracing_tpu.parallel import distributed as D
    from adjointnonlinearraytracing_tpu.parallel import mesh as M
    from adjointnonlinearraytracing_tpu.tracer import api

    D.initialize(coordinator_address=f"127.0.0.1:{port}",
                 num_processes=nproc, process_id=pid)
    info = D.process_info()
    assert info["process_count"] == nproc, info

    # --- scene: small bump field, deterministic full ray batch ------------
    res, h = 9, 1.0
    span = (res - 1) * h
    idx = jnp.arange(res, dtype=jnp.float64) * h
    z, y, x3 = jnp.meshgrid(idx, idx, idx, indexing="ij")
    c = span / 2
    rif = 1.0 + 0.1 * jnp.exp(-((x3 - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
                              / (0.3 * span) ** 2)
    ds = h / 2

    n_global = 101  # deliberately NOT divisible by 8: exercises pad+mask
    start, stop, n_valid = D.local_ray_slice(n_global)
    padded = (stop - start) * nproc

    # full padded batch from one global seed; each host slices its range
    key = jax.random.PRNGKey(7)
    ex = jax.random.uniform(key, (padded, 2), minval=0.2 * span,
                            maxval=0.8 * span, dtype=jnp.float64)
    x_full = jnp.stack(
        [ex[:, 0], jnp.full((padded,), -0.4 * h, jnp.float64), ex[:, 1]],
        axis=-1)
    v_full = jnp.tile(jnp.array([[0.05, 1.0, -0.03]], dtype=jnp.float64),
                      (padded, 1))
    mask_full = jnp.arange(padded) < n_global
    target = jnp.array([c, 1.5 * span, c], dtype=jnp.float64)

    # --- sharded path ------------------------------------------------------
    mesh = M.make_ray_mesh()
    xg, vg, mg = D.global_ray_array(
        mesh, [np.asarray(x_full[start:stop]), np.asarray(v_full[start:stop]),
               np.asarray(mask_full[start:stop])])
    traced = M.make_sharded_trace(mesh, h, ds, res)

    def loss(rif, x, v, m):
        xt, vt = traced(rif, x, v)
        per_ray = jnp.sum((xt - target) ** 2, axis=-1)
        return jnp.sum(jnp.where(m, per_ray, 0.0))

    g_sharded = jax.jit(jax.grad(loss))(rif, xg, vg, mg)
    g_sharded = np.asarray(jax.device_get(g_sharded))

    # --- single-process reference (full batch, no mesh) --------------------
    def loss_ref(rif):
        xt, vt = api.trace(rif, x_full, v_full, h, ds)
        per_ray = jnp.sum((xt - target) ** 2, axis=-1)
        return jnp.sum(jnp.where(mask_full, per_ray, 0.0))

    g_ref = np.asarray(jax.grad(loss_ref)(rif))

    scale = np.abs(g_ref).max()
    err = np.abs(g_sharded - g_ref).max() / scale
    assert err < 1e-12, f"sharded grad mismatch: rel err {err}"
    assert n_valid > 0 and padded * nproc >= n_global
    print(f"MULTIHOST_OK {pid} {err:.3e}", flush=True)


if __name__ == "__main__":
    main()

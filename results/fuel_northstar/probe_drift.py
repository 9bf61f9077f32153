"""CPU probe: interpret the 129^3 stage's grad spotcheck number.

The per-stage spotcheck (run_fuel_northstar.py) reports the MAX relative
deviation between the constant-memory adjoint gradient and the
checkpointed-exact gradient; at the fine stages it printed 0.32-0.44 while
the reconstruction nevertheless converged (rel_norm 0.271, decreasing).
This probe reproduces the final stage's spotcheck scene bit-for-bit on CPU
(same PRNGKey(0) measurement rays, same upres(eta_65)->129 field + 3e-3
gaussian bump, same ds) and reports what that max-norm number is made of:
direction agreement (cosine), norm ratio, and deviation percentiles.
Run: PALLAS_AXON_POOL_IPS= python results/fuel_northstar/probe_drift.py
"""
import json
import os

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from adjointnonlinearraytracing_tpu import tracer
from adjointnonlinearraytracing_tpu.opt.multires import upres_scene
from adjointnonlinearraytracing_tpu.sources import sources as S

VOL_SPAN, FUEL_VAL, RES = 1.0, 0.0003, 129
h = VOL_SPAN / (RES - 1)
ds = h / 2

rays, _ = S.rand_rays_in_sphere(
    jax.random.PRNGKey(0), 32, (128, 128), 20, VOL_SPAN, sensor_dist=0)
x = jnp.asarray(np.asarray(rays.x[:2048], np.float32))
v = jnp.asarray(np.asarray(rays.v[:2048], np.float32))
m = jnp.asarray(np.asarray(rays.mask[:2048]))

eta65 = jnp.asarray(np.load(os.path.join(os.path.dirname(__file__),
                                         "eta_65.npy")), jnp.float32)
eta = upres_scene(eta65, RES)
ax = jnp.linspace(-1.0, 1.0, RES, dtype=eta.dtype)
zz, yy, xx = jnp.meshgrid(ax, ax, ax, indexing="ij")
eta = eta + 10 * FUEL_VAL * jnp.exp(-(xx ** 2 + yy ** 2 + zz ** 2) / 0.18)


def probe_loss(trace_fn):
    def f(nt):
        xt, vt = trace_fn(nt, x, v, h, ds)
        per = jnp.sum(xt ** 2 + xt * vt, axis=-1)
        return jnp.sum(jnp.where(m, per, 0.0))
    return f


g_adj = np.asarray(jax.grad(probe_loss(tracer.trace))(eta)).ravel()
g_ex = np.asarray(jax.grad(probe_loss(
    lambda nt, x, v, h, ds: tracer.trace_exact(nt, x, v, h, ds)))(eta)).ravel()

scale = max(np.max(np.abs(g_ex)), 1e-30)
d = np.abs(g_adj - g_ex)
out = {
    "max_rel (the reported spotcheck metric)": float(d.max() / scale),
    "cosine(g_adj, g_ex)": float(
        g_adj @ g_ex / (np.linalg.norm(g_adj) * np.linalg.norm(g_ex))),
    "norm_ratio": float(np.linalg.norm(g_adj) / np.linalg.norm(g_ex)),
    "rel_l2 ||g_adj-g_ex||/||g_ex||": float(
        np.linalg.norm(d) / np.linalg.norm(g_ex)),
    "p50_rel": float(np.percentile(d, 50) / scale),
    "p99_rel": float(np.percentile(d, 99) / scale),
    "p999_rel": float(np.percentile(d, 99.9) / scale),
    "frac_voxels_above_1pct": float(np.mean(d / scale > 1e-2)),
}
print(json.dumps(out, indent=2))
with open(os.path.join(os.path.dirname(__file__),
                       "spotcheck_drift_cpu.json"), "w") as f:
    json.dump(out, f, indent=2)

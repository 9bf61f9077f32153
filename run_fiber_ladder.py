"""Fiber full ladder to 129 bins vs sqrt(2-r^2) GT (ROADMAP experiments item)."""
import json
import jax.numpy as jnp
import numpy as np
from adjointnonlinearraytracing_tpu.experiments import fiber

params = fiber.default_params()
params.update(optim_iters=40, record_iters=40)
n, hist = fiber.multires_exp(params, result_dir="results/fiber_129")

gt = fiber.ground_truth(int(n.shape[0]), dtype=n.dtype)
l1 = float(jnp.mean(jnp.abs(n - gt)))
print(json.dumps({"bins": int(n.shape[0]),
                  "l1_vs_gt": l1,
                  "first_loss": float(hist[0]), "last_loss": float(hist[-1])}))
np.save("results/fiber_129/final_profile.npy", np.asarray(n))

"""Flagship einstein/turing multi-view run (reference image_opt defaults)."""
import json
from adjointnonlinearraytracing_tpu.experiments import image

eta, hist = image.run_multiview_exp(
    result_dir="results/einstein_turing_128",
    resolution=128,
    optim_iters=50,
    res_list=[3, 5, 9, 17, 33, 65, 129],
    vol_span=20, step_res=2, spp=8, lr=1e-4, seed=0,
    record_iters=50,
)
print(json.dumps({"first_loss": float(hist[0]), "last_loss": float(hist[-1]),
                  "n_iters": len(hist)}))

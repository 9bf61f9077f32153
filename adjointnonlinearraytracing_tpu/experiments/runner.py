"""Run any shipped params YAML end-to-end: the reference's missing CLI.

The reference ships ``data/params-*.yaml`` (default/override schema) but the
runner that consumed them lived outside its repo (SURVEY.md §2.2).  This
module is that runner: it loads a section with config.load_params, maps the
reference key names onto the driver params, materializes file-path params
into arrays (images, sdf textures — with documented synthetic fallbacks for
assets the reference repo never shipped), and dispatches to the right
experiment driver.

Usage::

    python -m adjointnonlinearraytracing_tpu.experiments.runner \
        configs/params-sdf.yaml lr3e-4-w10-final --result-dir results/sdf

Family is inferred from the filename (``params-<family>*.yaml``) or an
explicit ``family:`` key in the YAML.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from . import config as cfg
from . import voxel_scenes


def l2ball_sdf(res: int, span: float, radius_frac: float = 0.25,
               dtype=jnp.float32):
    """Signed-distance texture of a centered disk (the reference's
    data/sdf/l2ball.npy, absent from its repo: params-sdf.yaml:8-11).
    Zero level set at ``radius_frac * span``; hits inside the ball cost 0
    gradient direction toward it elsewhere."""
    c = jnp.linspace(-span / 2, span / 2, res, dtype=dtype)
    u, w = jnp.meshgrid(c, c, indexing="ij")
    return jnp.sqrt(u ** 2 + w ** 2) - radius_frac * span


def _load_tex(path: Optional[str], res: int, span: float):
    """Load a .npy distance texture; synthesize the l2ball when absent."""
    if path and os.path.exists(path):
        return jnp.asarray(np.load(path), dtype=jnp.float32)
    return l2ball_sdf(res, span)


def _load_image_list(paths, resolution):
    from .image import load_image
    from ..sources import sources as S

    out = []
    for p in paths or []:
        if p and os.path.exists(p):
            out.append(S.sum_norm(load_image(p, resolution)))
        elif p and os.path.exists(voxel_scenes.data_path(os.path.basename(p))):
            out.append(S.sum_norm(load_image(
                voxel_scenes.data_path(os.path.basename(p)), resolution)))
        else:
            out.append(None)
    return out


def infer_family(path: str, params: Dict) -> str:
    if "family" in params:
        return params["family"]
    base = os.path.basename(path)
    for fam in ("luneburg", "sdf", "fiber", "focalstack", "image", "fuel"):
        if fam in base:
            return fam
    if "legoknight" in base or "fs" in base.replace("params-", ""):
        return "focalstack"
    raise ValueError(f"cannot infer experiment family from {path}; "
                     "add a 'family:' key to the YAML")


def run(path: str, section: Optional[str] = None,
        result_dir: Optional[str] = None, overrides: Optional[Dict] = None):
    """Load + dispatch.  Returns the driver's result tuple."""
    params = cfg.load_params(path, section)
    params.update(overrides or {})
    family = infer_family(path, params)
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)

    if family == "luneburg":
        from . import luneburg
        return luneburg.run_opt(params, result_dir)

    if family == "fiber":
        from . import fiber
        return fiber.multires_exp(params, result_dir)

    if family == "fuel":
        from . import fuel_injection
        return fuel_injection.run_opt(params, result_dir)

    if family in ("image", "sdf"):
        from . import image
        nbins = params.get("nbins", 128)
        if params.get("sdf_loss", False):
            # params-sdf.yaml schema: per-view sdf texture paths; synthetic
            # l2ball fallback (the reference never shipped data/sdf/)
            nviews = params.get("nviews", 1)
            span = params.get("vol_span", 20)
            fspan = params.get("far_sensor_span", 90)
            disp = [_load_tex(p, nbins, span)
                    for p in (params.get("disp_sdf_path") or [None])]
            defl = [_load_tex(p, nbins,
                              2 * float(np.sin(0.5 * np.deg2rad(fspan))))
                    for p in (params.get("defl_sdf_path") or [None])]
            params.setdefault("sdf_disp", disp * nviews)
            params.setdefault("sdf_defl", defl * nviews)
            params.setdefault("disp_ims", [None] * nviews)
            params.setdefault("defl_ims", [None] * nviews)
        else:
            ims = _load_image_list(
                params.get("images") or params.get("image_path"), nbins)
            params.setdefault("disp_ims", ims)
        return image.multires_exp(params, result_dir)

    if family == "focalstack":
        from . import focalstack
        nbins = params.get("nbins", 256)
        stack = _load_image_list(params.get("focal_list"), nbins)
        params.setdefault("src_angle", params.get("source_angle", 1.0))
        if any(im is None for im in stack):
            # lego-knight captures are not in the reference repo
            # (focalstack.py docstring): manufacture a GT stack from a
            # synthetic scene at the target resolution instead
            scene = voxel_scenes.gaussian_bump(
                params.get("res_list", [33])[-1], params.get("vol_span", 10))
            gen = dict(params)
            # emission weights must be non-negative (the reference uses
            # sum-normalized captures): a disk indicator, not the raw SDF
            gen["source_image"] = jnp.maximum(
                -l2ball_sdf(nbins, params.get("vol_span", 10)), 0.0)
            stack = focalstack.make_synthetic_stack(scene, gen)
            # the lkfs* YAML sections carry ``source_image: true`` (use the
            # in-focus capture) — with no capture shipped, replace the bool
            # placeholder with the synthetic emission outright
            if params.get("source_image") in (None, True):
                params["source_image"] = gen["source_image"]
        elif params.get("source_image") is True or "source_image" not in params:
            # reference 'srciminfocus' sections: emission sampled from the
            # in-focus capture (params-legoknight-fs.yaml:118-128)
            params["source_image"] = stack[0]
        params["focal_stack"] = stack
        return focalstack.multires_exp(params, result_dir)

    raise ValueError(f"unknown experiment family {family!r}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("yaml")
    ap.add_argument("section", nargs="?", default=None)
    ap.add_argument("--result-dir", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="override: key=value (YAML-parsed)")
    args = ap.parse_args(argv)
    import yaml as _yaml
    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = _yaml.safe_load(v)
    return run(args.yaml, args.section, args.result_dir, overrides)


if __name__ == "__main__":
    main()

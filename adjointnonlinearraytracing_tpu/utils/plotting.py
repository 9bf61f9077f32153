"""Image/plot dumps (utils/plot_utils.py twin + loss/profile plots)."""

from __future__ import annotations

import os

import numpy as np


def _ensure_dir(path: str):
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)


def save_multiple_images(images, outname: str):
    """Row-of-images dump (reference utils/plot_utils.py:5-10)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(outname)
    n = len(images)
    fig, axes = plt.subplots(1, n, squeeze=False, figsize=(3 * n, 3))
    for i, im in enumerate(images):
        axes[0, i].imshow(np.asarray(im))
        axes[0, i].axis("off")
    fig.savefig(outname, bbox_inches="tight", dpi=100)
    plt.close(fig)


def save_loss_plot(loss_hist, outname: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(outname)
    fig = plt.figure()
    plt.plot(np.asarray(loss_hist))
    plt.xlabel("iteration")
    plt.ylabel("loss")
    plt.yscale("log")
    fig.savefig(outname, bbox_inches="tight", dpi=100)
    plt.close(fig)


def save_profile_plot(profile, grad, outname: str):
    """Radial profile + gradient dump (fiber_opt.py:50-56)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(outname)
    fig, ax = plt.subplots(1, 2, figsize=(8, 3))
    ax[0].plot(np.asarray(profile))
    ax[0].set_title("radial profile")
    ax[1].plot(np.asarray(grad))
    ax[1].set_title("gradient profile")
    fig.savefig(outname, bbox_inches="tight", dpi=100)
    plt.close(fig)

"""2D visualization helpers (matplotlib, host-side).

Replaces ``diffdrr.visualization.plot_drr``/``plot_mask`` and the reference's
``plot_registration`` (/root/reference/src/xvr/visualization/viz2d.py:9-53).
Matplotlib is an optional dependency; import errors surface only when called.
"""

from __future__ import annotations

import numpy as np


def plot_drr(imgs, axs=None, title=None, ticks=True, cmap="gray"):
    """Plot a batch of DRRs (B, 1, H, W) on a row of axes."""
    import matplotlib.pyplot as plt

    imgs = np.asarray(imgs)
    if imgs.ndim == 3:
        imgs = imgs[None]
    B = imgs.shape[0]
    if axs is None:
        _, axs = plt.subplots(ncols=B, figsize=(3 * B, 3))
        if B == 1:
            axs = [axs]
    for ax, img in zip(np.ravel(axs), imgs):
        ax.imshow(img[0], cmap=cmap)
        if title:
            ax.set_title(title)
        if not ticks:
            ax.set_xticks([])
            ax.set_yticks([])
    return axs


def plot_mask(masks, axs, alpha=0.25, colors=("tab:red", "tab:blue", "tab:green", "tab:orange")):
    """Overlay foreground mask channels (B, C, H, W) on existing axes."""
    import matplotlib.colors as mcolors

    masks = np.asarray(masks)
    for ax, m in zip(np.ravel(axs), masks):
        for c in range(m.shape[0]):
            color = mcolors.to_rgba(colors[c % len(colors)])
            overlay = np.zeros(m.shape[-2:] + (4,))
            overlay[..., :3] = color[:3]
            overlay[..., 3] = alpha * (m[c] > 0)
            ax.imshow(overlay)
    return axs


def plot_registration(projector, fiducials, true_pose, pred_pose, save_path=None):
    """Side-by-side pred/true/error DRRs with projected fiducials and mTRE
    (semantics of viz2d.py:9-53)."""
    import matplotlib.pyplot as plt

    from ..metrics.evaluator import Evaluator

    ev = Evaluator(projector, fiducials)
    metrics = np.asarray(ev(true_pose, pred_pose))
    mtre = float(metrics[..., 2] if metrics.ndim else metrics)

    pred_img = np.asarray(projector(pred_pose))
    true_img = np.asarray(projector(true_pose))
    pts_pred = np.asarray(projector.perspective_projection(pred_pose, fiducials))[0]
    pts_true = np.asarray(projector.perspective_projection(true_pose, fiducials))[0]

    fig, axs = plt.subplots(ncols=3, figsize=(9, 3))
    for ax, img, name in zip(
        axs, [pred_img, true_img, pred_img - true_img], ["Predicted", "Ground truth", "Error"]
    ):
        ax.imshow(np.asarray(img).squeeze()[None][0] if img.ndim == 2 else img.squeeze(), cmap="gray")
        ax.set_title(name)
        ax.set_xticks([])
        ax.set_yticks([])
    axs[0].scatter(pts_pred[:, 0], pts_pred[:, 1], c="tab:orange", s=8)
    axs[1].scatter(pts_true[:, 0], pts_true[:, 1], c="tab:blue", s=8)
    fig.suptitle(f"mTRE = {mtre:.2f} mm")
    if save_path is not None:
        fig.savefig(save_path, bbox_inches="tight")
        plt.close(fig)
    return fig

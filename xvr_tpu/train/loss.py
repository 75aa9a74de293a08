"""Composite pose-regression training loss.

Semantics of /root/reference/src/xvr/model/loss.py:5-50:
``w_ncc * (1 - mNCC) + w_dice * Dice + w_geo * doubleGeodesic`` per sample,
plus an optional multiview-consistency (mvc) term over all pose pairs.

TPU-first difference: the reference drops "empty" rendered samples by dynamic
filtering (trainer.py:200-205), which would force dynamic shapes under jit.
Here every term takes a per-sample ``keep`` weight instead — dropped samples
contribute zero loss and zero gradient, shapes stay static.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import RigidTransform
from ..metrics.dice import dice_loss
from ..metrics.geodesic import double_geodesic
from ..metrics.ncc import multiscale_ncc


def _weighted_mean(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * w) / jnp.clip(jnp.sum(w), 1e-6)


def pose_regression_loss(
    img: jnp.ndarray,  # (B, 1, H, W) normalized target DRRs
    mask: jnp.ndarray | None,  # (B, C, H, W) target foreground masks (or None)
    pose: RigidTransform,  # (B,) ground-truth poses
    pred_img: jnp.ndarray,
    pred_mask: jnp.ndarray | None,
    pred_pose: RigidTransform,
    keep: jnp.ndarray,  # (B,) 0/1 sample weights (keep-filter)
    sdd: float,
    weight_ncc: float = 1.0,
    weight_geo: float = 1e-2,
    weight_dice: float = 1.0,
    weight_mvc: float = 0.0,
):
    """-> (scalar loss, dict of scalar metrics)."""
    mncc = multiscale_ncc(img, pred_img, (None, 9), (0.5, 0.5))
    if mask is not None and pred_mask is not None and mask.shape[1] > 1:
        dice = dice_loss(mask, pred_mask)
    else:
        dice = jnp.zeros_like(mncc)
    rgeo, tgeo, dgeo = double_geodesic(pose, pred_pose, sdd)

    per_sample = weight_ncc * (1.0 - mncc) + weight_dice * dice + weight_geo * dgeo
    loss = _weighted_mean(per_sample, keep)

    # Multiview consistency: geodesic between relative poses of all kept pairs.
    # O(B^2) pairs — only built when the term carries weight (off by default).
    if weight_mvc > 0:
        B = mncc.shape[0]
        iu, ju = jnp.triu_indices(B, k=1)
        inv_true = RigidTransform(pose.matrix[iu]).inverse().matrix
        inv_pred = RigidTransform(pred_pose.matrix[iu]).inverse().matrix
        rel_true = RigidTransform(pose.matrix[ju] @ inv_true)
        rel_pred = RigidTransform(pred_pose.matrix[ju] @ inv_pred)
        *_, mvc_per_pair = double_geodesic(rel_true, rel_pred, sdd)
        pair_w = keep[iu] * keep[ju]
        mvc = _weighted_mean(mvc_per_pair, pair_w)
        loss = loss + weight_mvc * mvc
    else:
        mvc = jnp.zeros(())

    metrics = {
        "mncc": _weighted_mean(mncc, keep),
        "dgeo": _weighted_mean(dgeo, keep),
        "rgeo": _weighted_mean(rgeo, keep),
        "tgeo": _weighted_mean(tgeo, keep),
        "dice": _weighted_mean(dice, keep),
        "mvc": mvc,
        "kept": jnp.mean(keep),
    }
    return loss, metrics

"""Multi-channel 2D Dice coefficient and loss.

Semantics of the reference's own DiceMetric/DiceLoss
(/root/reference/src/xvr/model/loss.py:53-89): channel 0 is background and is
excluded; empty channels (0/0) are treated as NaN and ignored by the loss's
nanmean, which maps to a masked mean here.
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_coefficient(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) x2 -> (B, C-1) Dice per foreground channel (NaN if empty)."""
    B, C = y_pred.shape[:2]
    p = y_pred.reshape(B, C, -1)
    t = y_true.reshape(B, C, -1)
    inter = jnp.sum(p * t, axis=2)
    denom = jnp.sum(p, axis=2) + jnp.sum(t, axis=2)
    dice = 2.0 * inter / denom  # NaN where denom == 0, like the reference
    return dice[:, 1:]


def dice_loss(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """(B, C, H, W) x2 -> (B,) loss = 1 - nanmean(dice); all-empty -> 0."""
    B, C = y_pred.shape[:2]
    if C <= 1:
        return jnp.zeros((B,), dtype=y_pred.dtype)
    p = y_pred.reshape(B, C, -1)
    t = y_true.reshape(B, C, -1)
    inter = jnp.sum(p * t, axis=2)[:, 1:]
    denom = (jnp.sum(p, axis=2) + jnp.sum(t, axis=2))[:, 1:]
    valid = denom > 0
    dice = jnp.where(valid, 2.0 * inter / jnp.clip(denom, 1e-12), 0.0)
    n_valid = jnp.sum(valid, axis=1)
    mean = jnp.sum(dice, axis=1) / jnp.clip(n_valid, 1)
    # nanmean(-> NaN if no valid channel) followed by nan_to_num -> 0 loss
    return jnp.where(n_valid > 0, 1.0 - mean, 0.0)

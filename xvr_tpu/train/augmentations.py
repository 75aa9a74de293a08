"""X-ray augmentation pipeline, PRNG-keyed and fully vectorized.

JAX-native re-design of the kornia pipeline at
/root/reference/src/xvr/model/augmentations.py:7-68: Standardize -> CLAHE ->
gamma -> box blur -> Gaussian noise -> sharpness -> erasing -> random center
crop (collimation), each applied per-sample with probability ``p``. The whole
pipeline runs inside the jitted train step on rendered DRRs (which carry no
gradient), so none of it needs to be differentiable — only shape-static and
branch-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..metrics.ncc import _depthwise2d
from ..utils.transforms import standardize


def _maybe(key, p, x, x_aug):
    """Apply per-sample: x_aug where bernoulli(p), else x."""
    take = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(take[:, None, None, None], x_aug, x)


# -- CLAHE -------------------------------------------------------------------


def _clahe_corner_plan(H: int, W: int, grid: int):
    """Host-side static plan for the half-tile-cell CLAHE interpolation.

    Pixels within one half-tile cell share the same 4 corner tiles; only the
    bilinear weights vary per pixel. Returns (corner index arrays (C2, 4, 2)
    into the (grid, grid) tile grid, per-pixel corner weights (C2, P2, 4))
    for cells of (th/2, tw/2) pixels — all NumPy, baked into the jaxpr.
    """
    import numpy as np

    th, tw = H // grid, W // grid
    th2, tw2 = th // 2, tw // 2

    def axis_plan(n_px, tile, half):
        cells = n_px // half
        lo = np.zeros(cells, np.int32)
        hi = np.zeros(cells, np.int32)
        frac = np.zeros((cells, half), np.float64)
        for ci in range(cells):
            px = ci * half + np.arange(half)
            yy = (px + 0.5) / tile - 0.5
            y0 = np.clip(np.floor(yy).astype(np.int64), 0, grid - 1)
            assert (y0 == y0[0]).all()
            lo[ci] = y0[0]
            hi[ci] = min(y0[0] + 1, grid - 1)
            frac[ci] = np.clip(yy - y0, 0.0, 1.0)
        return lo, hi, frac

    ylo, yhi, fy = axis_plan(H, th, th2)
    xlo, xhi, fx = axis_plan(W, tw, tw2)
    cy, cx = len(ylo), len(xlo)
    # corner tile indices per cell: (cy*cx, 4, 2) in order 00, 01, 10, 11
    ty = np.stack(np.broadcast_arrays(ylo[:, None], ylo[:, None], yhi[:, None], yhi[:, None]), 1)[..., 0]
    tx = np.stack(np.broadcast_arrays(xlo[None, :], xhi[None, :], xlo[None, :], xhi[None, :]), 0)[..., 0, :]
    corner_y = np.broadcast_to(ty[:, None, :], (cy, cx, 4)).reshape(-1, 4)
    corner_x = np.broadcast_to(tx.T[None, :, :], (cy, cx, 4)).reshape(-1, 4)
    # per-pixel weights: (cy, th2, cx, tw2, 4) -> (C2, P2, 4)
    wy = np.stack([1.0 - fy, 1.0 - fy, fy, fy], -1)  # (cy, th2, 4)
    wx = np.stack([1.0 - fx, fx, 1.0 - fx, fx], -1)  # (cx, tw2, 4)
    w = wy[:, None, :, None, :] * wx[None, :, None, :, :]
    w = w.reshape(cy * cx, th2 * tw2, 4).astype(np.float32)
    return corner_y, corner_x, w, (cy, cx, th2, tw2)


def clahe(
    x: jnp.ndarray,
    clip_limit: jnp.ndarray,
    grid: int = 8,
    n_bins: int = 64,
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on [0,1] images.

    Per-tile histograms are clipped at ``clip_limit * mean_count``, excess is
    redistributed uniformly, and pixels are mapped through bilinearly
    interpolated tile CDFs (kornia RandomClahe semantics; clip_limit is
    sampled per batch item from U(1, 10) per augmentations.py:16).

    TPU-first formulation: histograms AND the per-pixel CDF lookups are
    one-hot matmuls on the MXU. Pixels are regrouped into half-tile cells —
    every pixel of a cell shares the same 4 corner tiles, so the bilinear
    CDF interpolation becomes, per cell, ``onehot(bins) @ corner_cdfs``
    ((P2, K) @ (K, 4)) followed by static per-pixel corner weights. The
    naive per-pixel gather formulation materialized (B, H, W, n_bins) four
    times and cost ~180 ms/step at batch 116 — this runs in ~1 ms.
    """
    B, C, H, W = x.shape
    # images smaller than the 2*grid cell quantum degrade to a coarser grid
    # (reflect-pad needs pad < dim, so padding alone cannot cover them)
    grid = max(min(grid, H // 2, W // 2), 1)
    q = 2 * grid
    if H % q or W % q:
        # pad (reflect) to the cell quantum and crop back — CLAHE is a
        # stochastic augmentation; sub-tile alignment shifts are immaterial
        ph, pw = (-H) % q, (-W) % q
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="reflect")
        return clahe(xp, clip_limit, grid, n_bins)[..., :H, :W]
    th, tw = H // grid, W // grid
    xq = x[:, 0]
    tiles = xq.reshape(B, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(B, grid * grid, th * tw)

    # Per-tile histogram: one-hot (bf16, exact for 0/1) contracted on the MXU
    idx = jnp.clip((tiles * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = jax.nn.one_hot(idx, n_bins, dtype=jnp.bfloat16)  # (B, T, P, K)
    hist = jnp.einsum(
        "btpk,p->btk", onehot, jnp.ones((th * tw,), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    # Clip and redistribute
    mean_count = (th * tw) / n_bins
    limit = clip_limit[:, None, None] * mean_count
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.reshape(B, grid, grid, n_bins)

    corner_y, corner_x, w, (cy, cx, th2, tw2) = _clahe_corner_plan(H, W, grid)
    # (B, C2, K, 4): the 4 corner-tile CDF tables per cell (static indices)
    corner_cdf = cdf[:, corner_y, corner_x, :].transpose(0, 1, 3, 2)

    # pixels -> cells, matching the (cy, th2, cx, tw2) weight layout
    cells = xq.reshape(B, cy, th2, cx, tw2).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(B, cy * cx, th2 * tw2)
    bins_idx = jnp.clip((cells * n_bins).astype(jnp.int32), 0, n_bins - 1)
    pix_onehot = jax.nn.one_hot(bins_idx, n_bins, dtype=jnp.bfloat16)  # (B, C2, P2, K)
    vals = jnp.einsum(
        "bcpk,bckq->bcpq", pix_onehot, corner_cdf.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (B, C2, P2, 4)
    v = jnp.sum(vals * jnp.asarray(w)[None], axis=-1)  # (B, C2, P2)
    v = v.reshape(B, cy, cx, th2, tw2).transpose(0, 1, 3, 2, 4).reshape(B, H, W)
    return v[:, None]


# -- simple photometric ops --------------------------------------------------


_BOX3 = jnp.ones((3, 3)) / 9.0


def box_blur(x):
    return _depthwise2d(x, _BOX3.astype(x.dtype))


def sharpness(x, factor):
    """kornia-style sharpness: blend towards an unsharp-masked image."""
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smooth = _depthwise2d(x, k.astype(x.dtype))
    f = factor[:, None, None, None]
    return x + f * (x - smooth)


def random_erasing(key, x, scale=(0.02, 0.33), ratio=(0.3, 3.3)):
    """Zero a random rectangle per sample (static shapes via masking)."""
    B, C, H, W = x.shape
    ks, kr, ky, kx = jax.random.split(key, 4)
    area = jax.random.uniform(ks, (B,), minval=scale[0], maxval=scale[1]) * H * W
    log_r = jax.random.uniform(
        kr, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    r = jnp.exp(log_r)
    h = jnp.clip(jnp.sqrt(area * r), 1, H)
    w = jnp.clip(jnp.sqrt(area / r), 1, W)
    top = jax.random.uniform(ky, (B,)) * (H - h)
    left = jax.random.uniform(kx, (B,)) * (W - w)
    yy = jnp.arange(H, dtype=x.dtype)[None, :, None]
    xx = jnp.arange(W, dtype=x.dtype)[None, None, :]
    inside = (
        (yy >= top[:, None, None]) & (yy < (top + h)[:, None, None])
        & (xx >= left[:, None, None]) & (xx < (left + w)[:, None, None])
    )
    return jnp.where(inside[:, None], 0.0, x)


def random_center_crop(key, x, maxcrop: int = 10):
    """Zero a border of random width per sample — collimation simulation
    (RandomCenterCrop, augmentations.py:31-57)."""
    B, C, H, W = x.shape
    crop = jax.random.randint(key, (B,), 0, maxcrop + 1).astype(x.dtype)
    yy = jnp.arange(H, dtype=x.dtype)[None, :, None]
    xx = jnp.arange(W, dtype=x.dtype)[None, None, :]
    c = crop[:, None, None]
    inside = (yy >= c) & (yy < H - c) & (xx >= c) & (xx < W - c)
    return jnp.where(inside[:, None], x, 0.0)


# -- the pipeline ------------------------------------------------------------


def xray_augmentations(
    key: jax.Array, x: jnp.ndarray, p: float = 0.333, max_crop: int = 10
) -> jnp.ndarray:
    """Full augmentation pipeline on (B, 1, H, W) images."""
    B = x.shape[0]
    keys = jax.random.split(key, 16)
    x = standardize(x)

    # CLAHE
    clip = jax.random.uniform(keys[0], (B,), minval=1.0, maxval=10.0)
    x = _maybe(keys[1], p, x, clahe(x, clip))

    # Gamma
    gamma = jax.random.uniform(keys[2], (B,), minval=0.7, maxval=1.8)
    x = _maybe(keys[3], p, x, jnp.clip(x, 1e-8) ** gamma[:, None, None, None])

    # Box blur
    x = _maybe(keys[4], p, x, box_blur(x))

    # Gaussian noise
    noise = 0.01 * jax.random.normal(keys[5], x.shape, dtype=x.dtype)
    x = _maybe(keys[6], p, x, x + noise)

    # Sharpness
    factor = jax.random.uniform(keys[7], (B,), minval=0.0, maxval=0.5)
    x = _maybe(keys[8], p, x, sharpness(x, factor))

    # Erasing
    x = _maybe(keys[9], p, x, random_erasing(keys[10], x))

    # Collimation crop
    x = _maybe(keys[11], p, x, random_center_crop(keys[12], x, max_crop))
    return x

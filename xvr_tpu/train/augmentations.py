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

from functools import partial

import jax
import jax.numpy as jnp

from ..metrics.ncc import _depthwise2d
from ..utils.transforms import standardize


def _maybe(key, p, x, x_aug):
    """Apply per-sample: x_aug where bernoulli(p), else x."""
    take = jax.random.bernoulli(key, p, (x.shape[0],))
    return jnp.where(take[:, None, None, None], x_aug, x)


# -- CLAHE -------------------------------------------------------------------


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
    """
    B, C, H, W = x.shape
    th, tw = H // grid, W // grid
    xq = x[:, 0, : th * grid, : tw * grid]  # single-channel path
    tiles = xq.reshape(B, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(B, grid * grid, th * tw)

    # Soft histogram via hard binning (one-hot matmul — MXU-friendly)
    idx = jnp.clip((tiles * n_bins).astype(jnp.int32), 0, n_bins - 1)
    onehot = jax.nn.one_hot(idx, n_bins, dtype=x.dtype)  # (B, T, P, n_bins)
    hist = jnp.sum(onehot, axis=2)  # (B, T, n_bins)

    # Clip and redistribute
    mean_count = (th * tw) / n_bins
    limit = clip_limit[:, None, None] * mean_count
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / n_bins

    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[..., -1:]
    cdf = cdf.reshape(B, grid, grid, n_bins)

    # Bilinear interpolation of tile CDFs at every pixel
    yy = (jnp.arange(H, dtype=x.dtype) + 0.5) / th - 0.5
    xx = (jnp.arange(W, dtype=x.dtype) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, grid - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, grid - 1)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[None, :, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, None, :]

    bins_idx = jnp.clip((x[:, 0] * n_bins).astype(jnp.int32), 0, n_bins - 1)  # (B,H,W)

    def lut(ti, tj):  # gather cdf[b, ti[h], tj[w], bin(b,h,w)]
        c = cdf[:, ti, :, :][:, :, tj, :]  # (B, H, W, n_bins)
        return jnp.take_along_axis(c, bins_idx[..., None], axis=-1)[..., 0]

    v = (
        lut(y0, x0) * (1 - fy) * (1 - fx)
        + lut(y0, x1) * (1 - fy) * fx
        + lut(y1, x0) * fy * (1 - fx)
        + lut(y1, x1) * fy * fx
    )
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

"""Image-similarity metrics: NCC, multiscale NCC, gradient NCC.

Replaces ``diffdrr.metrics`` image metrics (contract from call sites:
``MultiscaleNormalizedCrossCorrelation2d([None, 9], [0.5, 0.5])`` at
/root/reference/src/xvr/model/loss.py:16 and registrar/base.py:118-120;
``GradientNormalizedCrossCorrelation2d(patch_size, sigma)`` at
registrar/base.py:121).

All metrics take (B, C, H, W) image batches and return a per-item (B,) score
in [-1, 1] (1 = identical up to affine intensity). Everything is expressed as
windowed moments via ``lax.reduce_window`` so XLA lowers the hot path to a
handful of fused reductions — no explicit patch extraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _flatten_moments(x: jnp.ndarray):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return mean, var


def ncc(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Global normalized cross correlation, (B, C, H, W) -> (B,)."""
    mx, vx = _flatten_moments(x)
    my, vy = _flatten_moments(y)
    cov = jnp.mean((x - mx) * (y - my), axis=(1, 2, 3))
    return cov / jnp.sqrt(jnp.clip(vx[:, 0, 0, 0] * vy[:, 0, 0, 0], eps))


def _band_matrix(n_out: int, n_in: int, p: int, dtype) -> jnp.ndarray:
    """(n_out, n_in) 0/1 matrix; row i sums inputs [i, i+p)."""
    i = jnp.arange(n_out)[:, None]
    j = jnp.arange(n_in)[None, :]
    return ((j >= i) & (j < i + p)).astype(dtype)


def _window_mean(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """VALID p x p box mean over (B, C, H, W) -> (B, C, H-p+1, W-p+1).

    On TPU this is expressed as two banded matmuls so the sliding-window
    sums run on the MXU (and transpose to matmuls in the backward pass)
    instead of lowering ``lax.reduce_window`` to an 81-tap VPU reduction;
    HIGHEST precision keeps the accumulation in f32 — the same adds as the
    direct window sum, reassociated. On CPU the direct reduction is kept:
    it is equally fast there and bit-stable against the historical behavior
    (the two paths agree to ~1e-5; see test_metrics).
    """
    import os

    H, W = x.shape[-2:]
    if (
        jax.default_backend() != "tpu"
        or H < p or W < p
        or os.environ.get("XVR_NCC_DIRECT")  # A/B the reduce_window lowering
    ):
        return _window_mean_direct(x, p)
    return _window_mean_matmul(x, p)


def _window_mean_direct(x: jnp.ndarray, p: int) -> jnp.ndarray:
    s = lax.reduce_window(x, 0.0, lax.add, (1, 1, p, p), (1, 1, 1, 1), "VALID")
    return s / (p * p)


def _window_mean_matmul(x: jnp.ndarray, p: int) -> jnp.ndarray:
    H, W = x.shape[-2:]
    ah = _band_matrix(H - p + 1, H, p, x.dtype)
    aw = _band_matrix(W - p + 1, W, p, x.dtype)
    s = jnp.einsum("oh,bchw->bcow", ah, x, precision=lax.Precision.HIGHEST)
    s = jnp.einsum("bcow,pw->bcop", s, aw, precision=lax.Precision.HIGHEST)
    return s / (p * p)


def local_ncc(x: jnp.ndarray, y: jnp.ndarray, patch_size: int, eps: float = 1e-6) -> jnp.ndarray:
    """Patchwise (local) NCC averaged over all valid patch centers -> (B,).

    Numerics: the one-pass covariance ``E[xy] - E[x]E[y]`` cancels
    catastrophically in float32 when patch means dominate, which can push
    near-constant patches far outside [-1, 1] and corrupt the similarity
    landscape. Globally centering both images first keeps the means near
    zero, the variance floor keeps flat patches finite, and the final clamp
    bounds the metric (flat regions carry no gradient anyway).

    The five windowed moments are stacked on the channel axis so the whole
    moment pass is one pair of banded matmuls (see ``_window_mean``).
    """
    p = patch_size
    x = x - jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    y = y - jnp.mean(y, axis=(1, 2, 3), keepdims=True)
    stacked = jnp.concatenate([x, y, x * y, x * x, y * y], axis=1)
    mx, my, mxy, mxx, myy = jnp.split(_window_mean(stacked, p), 5, axis=1)
    cov = mxy - mx * my
    vx = jnp.maximum(mxx - mx * mx, 0.0)
    vy = jnp.maximum(myy - my * my, 0.0)
    n = cov / jnp.sqrt((vx + eps) * (vy + eps))
    n = jnp.clip(n, -1.0, 1.0)
    return jnp.mean(n, axis=(1, 2, 3))


def multiscale_ncc(
    x: jnp.ndarray,
    y: jnp.ndarray,
    patch_sizes=(None, 9),
    patch_weights=(0.5, 0.5),
) -> jnp.ndarray:
    """Weighted mix of global and local NCC (the training/registration
    similarity, loss.py:16, registrar/base.py:118-120)."""
    out = 0.0
    for p, w in zip(patch_sizes, patch_weights):
        out = out + w * (ncc(x, y) if p is None else local_ncc(x, y, int(p)))
    return out


_SOBEL_X = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def _depthwise2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Same-padded single-kernel depthwise conv over (B, C, H, W)."""
    C = x.shape[1]
    k = jnp.broadcast_to(kernel, (C, 1) + kernel.shape)
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
    )


def sobel(x: jnp.ndarray) -> jnp.ndarray:
    """Spatial gradients: (B, C, H, W) -> (B, 2C, H, W) [d/dx, d/dy]."""
    gx = _depthwise2d(x, _SOBEL_X.astype(x.dtype))
    gy = _depthwise2d(x, _SOBEL_Y.astype(x.dtype))
    return jnp.concatenate([gx, gy], axis=1)


def gaussian_blur(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    if sigma <= 0:
        return x
    radius = max(int(3.0 * sigma + 0.5), 1)
    t = jnp.arange(-radius, radius + 1, dtype=x.dtype)
    k1 = jnp.exp(-0.5 * (t / sigma) ** 2)
    k1 = k1 / jnp.sum(k1)
    x = _depthwise2d(x, k1[None, :])
    x = _depthwise2d(x, k1[:, None])
    return x


def gradient_ncc(
    x: jnp.ndarray,
    y: jnp.ndarray,
    patch_size: int = 11,
    sigma: float = 0.0,
) -> jnp.ndarray:
    """Local NCC of Sobel gradients (edge-sensitive similarity used by the
    registrar, registrar/base.py:121-123), optionally after Gaussian blur."""
    x = sobel(gaussian_blur(x, sigma))
    y = sobel(gaussian_blur(y, sigma))
    return local_ncc(x, y, patch_size)


def make_imagesim(
    mncc_patch_size: int = 9,
    gncc_patch_size: int = 11,
    sigma: float = 0.0,
    beta: float = 0.5,
):
    """``beta * mNCC + (1 - beta) * gNCC`` — the registrar's similarity
    (semantics of registrar/base.py:115-123)."""

    @jax.jit
    def imagesim(x, y):
        s = beta * multiscale_ncc(x, y, (None, mncc_patch_size), (0.5, 0.5))
        if beta < 1.0:
            s = s + (1.0 - beta) * gradient_ncc(x, y, gncc_patch_size, sigma)
        return s

    return imagesim

"""Image normalization transforms applied to every X-ray / DRR.

Semantics of /root/reference/src/xvr/utils/preprocess.py:5-66:
``Standardize`` (min-max) -> optional differentiable histogram ``Equalize``
(soft-binned Gaussian-kernel CDF, n_bins=256, tau=0.01) -> ``Resize`` ->
``Normalize(mean=0.15, std=0.1)``. All functions take (B, C, H, W) and are
jit/grad-safe (the equalize is used inside the registrar's similarity loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def standardize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-batch-item min-max rescale to [0, 1] (preprocess.py:24-29)."""
    lo = jnp.min(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    hi = jnp.max(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    return (x - lo) / (hi - lo + eps)


def equalize(
    x: jnp.ndarray, n_bins: int = 256, tau: float = 0.01, eps: float = 1e-10
) -> jnp.ndarray:
    """Differentiable histogram equalization (preprocess.py:40-66).

    Soft-assigns each pixel to intensity bins with a Gaussian kernel of width
    ``tau``, builds the CDF, and maps pixels through it. O(pixels * bins)
    memory — evaluated in pixel chunks to stay VMEM-friendly.
    """
    B, C, H, W = x.shape
    flat = x.reshape(B, -1)  # (B, P)
    bins = jnp.linspace(0.0, 1.0, n_bins, dtype=x.dtype)

    def weights_of(chunk):  # (B, p) -> (B, p, n_bins)
        diff = chunk[..., None] - bins
        return jnp.exp(-(diff**2) / (2.0 * tau**2))

    # Histogram over all pixels (chunked accumulation keeps peak memory low)
    P = flat.shape[1]
    chunk = 8192
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    flat_p = jnp.pad(flat, ((0, 0), (0, pad)))
    valid = jnp.pad(jnp.ones_like(flat), ((0, 0), (0, pad)))
    chunks = flat_p.reshape(B, n_chunks, chunk)
    vchunks = valid.reshape(B, n_chunks, chunk)

    def hist_step(carry, inp):
        c, v = inp
        return carry + jnp.einsum("bp,bpn->bn", v, weights_of(c)), None

    hist, _ = jax.lax.scan(
        hist_step,
        jnp.zeros((B, n_bins), dtype=x.dtype),
        (jnp.moveaxis(chunks, 1, 0), jnp.moveaxis(vchunks, 1, 0)),
    )
    hist = hist / (jnp.sum(hist, axis=1, keepdims=True) + eps)
    cdf = jnp.cumsum(hist, axis=1)
    cdf0 = cdf[:, :1]
    cdf_n = (cdf - cdf0) / (1.0 - cdf0 + eps)

    def map_step(_, inp):
        c, v = inp
        w = weights_of(c)
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
        return None, jnp.einsum("bpn,bn->bp", w, cdf_n) * v

    _, mapped = jax.lax.scan(map_step, None, (jnp.moveaxis(chunks, 1, 0), jnp.moveaxis(vchunks, 1, 0)))
    out = jnp.moveaxis(mapped, 0, 1).reshape(B, -1)[:, :P]
    return out.reshape(B, C, H, W)


def resize(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize of (B, C, H, W) -> (B, C, height, width)."""
    B, C = x.shape[:2]
    return jax.image.resize(x, (B, C, height, width), method="bilinear")


def normalize(x: jnp.ndarray, mean: float = 0.15, std: float = 0.1) -> jnp.ndarray:
    return (x - mean) / std


def make_xray_transforms(
    height: int,
    width: int | None = None,
    mean: float = 0.15,
    std: float = 0.1,
    use_equalize: bool = False,
):
    """Composable pipeline = ``XrayTransforms`` (preprocess.py:5-21)."""
    width = height if width is None else width

    def transforms(x: jnp.ndarray) -> jnp.ndarray:
        x = standardize(x)
        if use_equalize:
            x = equalize(x)
        x = resize(x, height, width)
        return normalize(x, mean, std)

    return transforms


def center_crop(x: jnp.ndarray, out_h: int, out_w: int | None = None) -> jnp.ndarray:
    """Center crop of (B, C, H, W) (torchvision center_crop semantics)."""
    out_w = out_h if out_w is None else out_w
    H, W = x.shape[-2:]
    top = max((H - out_h) // 2, 0)
    left = max((W - out_w) // 2, 0)
    x = x[..., top : top + out_h, left : left + out_w]
    if x.shape[-2] != out_h or x.shape[-1] != out_w:  # pad if crop > image
        pad_h = out_h - x.shape[-2]
        pad_w = out_w - x.shape[-1]
        x = jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2)
            + [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)],
        )
    return x

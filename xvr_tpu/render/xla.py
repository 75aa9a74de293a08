"""Pure-XLA differentiable DRR renderers (trilinear + Siddon).

These are the reference implementations ("golden models") for the Pallas
kernels in :mod:`xvr_tpu.render.pallas`, and the default path on CPU. They
replace the renderer component of ``diffdrr`` (selected by ``--renderer
{siddon,trilinear}``, /root/reference/src/xvr/config/trainer.py:9; invoked via
``drr.renderer(density, source, target, img, mask=seg)`` at
/root/reference/src/xvr/model/trainer.py:288).

Both renderers consume **world-space** ray endpoints and a voxel->world
affine; integration weights are true path lengths in millimetres, so outputs
are radiological line integrals. Both are fully differentiable with respect to
the ray endpoints (and hence the pose); the trilinear renderer is additionally
differentiable with respect to the density grid.

Shapes: ``source`` (B, 1, 3) or (B, R, 3); ``target`` (B, R, 3).
Output: (B, R) without a labelmap, (B, C, R) with one (channel 0 = structures
outside the requested labels — the "background" channel excluded by the Dice
loss, /root/reference/src/xvr/model/loss.py:75-89).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _apply_affine(A: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    # precision="highest": default TPU matmul (bf16) adds ~0.5 mm of noise
    # to ray endpoints — fatal for sub-mm registration geometry
    return jnp.matmul(pts, A[:3, :3].T, precision="highest") + A[:3, 3]


def _aabb_alphas(s: jnp.ndarray, d: jnp.ndarray, shape) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit parameters of rays ``s + a * d`` with the voxel box.

    The box spans ``[-0.5, n - 0.5]`` per axis (voxel centers at integers).
    Returns (a_in, a_out), clipped to [0, 1]; empty intersections give
    a_in >= a_out.
    """
    n = jnp.asarray(shape, dtype=s.dtype)
    lo, hi = -0.5, n - 0.5
    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    a1 = (lo - s) / safe_d
    a2 = (hi - s) / safe_d
    amin = jnp.minimum(a1, a2)
    amax = jnp.maximum(a1, a2)
    # Degenerate axes (d ~ 0): ray parallel to the slab. Inside -> (-inf, inf).
    parallel = jnp.abs(d) < 1e-12
    inside = (s > lo) & (s < hi)
    amin = jnp.where(parallel, jnp.where(inside, -jnp.inf, jnp.inf), amin)
    amax = jnp.where(parallel, jnp.where(inside, jnp.inf, -jnp.inf), amax)
    a_in = jnp.clip(jnp.max(amin, axis=-1), 0.0, 1.0)
    a_out = jnp.clip(jnp.min(amax, axis=-1), 0.0, 1.0)
    a_out = jnp.maximum(a_out, a_in)
    return a_in, a_out


def trilinear_sample(grid: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of ``grid`` (nx, ny, nz) at voxel coords
    ``pts`` (..., 3). Out-of-grid corners contribute zero (zeros padding)."""
    nx, ny, nz = grid.shape
    p0 = jnp.floor(pts)
    f = pts - p0
    p0 = p0.astype(jnp.int32)
    flat = grid.reshape(-1)

    out = jnp.zeros(pts.shape[:-1], dtype=grid.dtype)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = p0[..., 0] + cx
                iy = p0[..., 1] + cy
                iz = p0[..., 2] + cz
                valid = (
                    (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny) & (iz >= 0) & (iz < nz)
                )
                idx = (
                    jnp.clip(ix, 0, nx - 1) * (ny * nz)
                    + jnp.clip(iy, 0, ny - 1) * nz
                    + jnp.clip(iz, 0, nz - 1)
                )
                w = (
                    jnp.where(cx, f[..., 0], 1.0 - f[..., 0])
                    * jnp.where(cy, f[..., 1], 1.0 - f[..., 1])
                    * jnp.where(cz, f[..., 2], 1.0 - f[..., 2])
                )
                out = out + jnp.where(valid, w, 0.0) * jnp.take(flat, idx)
    return out


def nearest_label(mask: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor labelmap lookup at voxel coords; out of grid -> 0."""
    nx, ny, nz = mask.shape
    idx = jnp.round(pts).astype(jnp.int32)
    valid = (
        (idx[..., 0] >= 0) & (idx[..., 0] < nx)
        & (idx[..., 1] >= 0) & (idx[..., 1] < ny)
        & (idx[..., 2] >= 0) & (idx[..., 2] < nz)
    )
    flat_idx = (
        jnp.clip(idx[..., 0], 0, nx - 1) * (ny * nz)
        + jnp.clip(idx[..., 1], 0, ny - 1) * nz
        + jnp.clip(idx[..., 2], 0, nz - 1)
    )
    lab = jnp.take(mask.reshape(-1), flat_idx)
    return jnp.where(valid, lab, 0)


def _channel_weights(labels_sampled: jnp.ndarray, labels: tuple[int, ...]) -> jnp.ndarray:
    """(...,) int labels -> (..., C) one-hot over [background] + labels."""
    fg = jnp.stack([labels_sampled == l for l in labels], axis=-1)  # (..., L)
    bg = ~jnp.any(fg, axis=-1, keepdims=True)
    return jnp.concatenate([bg, fg], axis=-1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("n_samples", "labels", "ray_chunk"))
def raymarch_trilinear(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    n_samples: int = 256,
    mask: jnp.ndarray | None = None,
    labels: tuple[int, ...] | None = None,
    ray_chunk: int | None = None,
) -> jnp.ndarray:
    """Fixed-step ray marching with trilinear interpolation (midpoint rule).

    Materializes (B, R, S[, 3]) sample tensors; at full detector resolution
    (1436^2 rays x 448 samples ~ 50 GB) that overflows HBM, so rays are
    processed in ``ray_chunk``-sized pieces via ``lax.map`` when R * S is
    large (auto) — same math, bounded memory, autodiff-compatible.
    """
    B, R = target.shape[0], target.shape[1]
    # 2^25 samples/chunk keeps the peak working set ~2-3 GB: at 2^27 a
    # full-resolution render (1436^2 x 448 samples) crashed the TPU worker
    # outright (each chunk materializes several (R_c, S, 3)-sized tensors)
    if ray_chunk is None and B * R * n_samples > 2**25:
        ray_chunk = max(1, 2**25 // (max(B, 1) * n_samples))
    if ray_chunk and ray_chunk < R:
        pad = (-R) % ray_chunk
        tgt = jnp.pad(target, ((0, 0), (0, pad), (0, 0)), mode="edge")
        nc = tgt.shape[1] // ray_chunk
        tchunks = tgt.reshape(B, nc, ray_chunk, 3).transpose(1, 0, 2, 3)
        out = jax.lax.map(
            lambda t: raymarch_trilinear(
                density, affine_inverse, source, t, n_samples,
                mask=mask, labels=labels, ray_chunk=0,
            ),
            tchunks,
        )
        if out.ndim == 4:  # (nc, B, C, rc) labelled channels
            out = out.transpose(1, 2, 0, 3).reshape(B, out.shape[2], nc * ray_chunk)
            return out[..., :R]
        out = out.transpose(1, 0, 2).reshape(B, nc * ray_chunk)
        return out[:, :R]
    s_vox = _apply_affine(affine_inverse, source)
    t_vox = _apply_affine(affine_inverse, target)
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d_vox = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)

    a_in, a_out = _aabb_alphas(s_vox, d_vox, density.shape)  # (B, R)
    span = a_out - a_in
    # Midpoint sample positions
    k = (jnp.arange(n_samples, dtype=density.dtype) + 0.5) / n_samples
    alphas = a_in[..., None] + span[..., None] * k  # (B, R, S)
    pts = s_vox[..., None, :] + alphas[..., None] * d_vox[..., None, :]
    vals = trilinear_sample(density, pts)  # (B, R, S)
    step = span[..., None] / n_samples * raylen[..., None]  # mm per sample

    if mask is None or labels is None:
        return jnp.sum(vals * step, axis=-1)
    lab = nearest_label(mask, pts)  # (B, R, S)
    w = _channel_weights(lab, labels)  # (B, R, S, C)
    img = jnp.einsum("brs,brsc->bcr", vals * step, w)
    return img


@partial(jax.jit, static_argnames=("n_samples",))
def raymarch_trilinear_scan(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    n_samples: int = 256,
) -> jnp.ndarray:
    """Memory-lean trilinear march: a ``lax.scan`` over sample depths.

    Identical math to :func:`raymarch_trilinear` but never materializes the
    (B, R, S, 3) sample tensor — peak memory is O(B * R) per step, which is
    what lets full-resolution (256^2+) benchmarks and registrations fit in
    HBM. Forward-optimized; prefer :func:`raymarch_trilinear` when
    reverse-mode memory is not a concern.
    """
    s_vox = _apply_affine(affine_inverse, source)
    t_vox = _apply_affine(affine_inverse, target)
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d_vox = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)
    a_in, a_out = _aabb_alphas(s_vox, d_vox, density.shape)
    span = a_out - a_in

    def body(acc, k):
        alpha = a_in + span * (k + 0.5) / n_samples
        pts = s_vox + alpha[..., None] * d_vox
        return acc + trilinear_sample(density, pts), None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros(a_in.shape, dtype=density.dtype),
        jnp.arange(n_samples, dtype=density.dtype),
    )
    return acc * span / n_samples * raylen


@partial(jax.jit, static_argnames=("labels", "n_steps", "unroll"))
def raymarch_siddon(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    labels: tuple[int, ...] | None = None,
    n_steps: int | None = None,
    unroll: int = 1,
) -> jnp.ndarray:
    """Exact Siddon ray tracing as an incremental DDA under ``lax.scan``.

    Marches every ray through successive axis-plane crossings (planes at
    half-integer voxel coordinates), accumulating ``density * segment length``.
    Loop length is the static bound nx+ny+nz+3 (each step crosses >= 1 plane).
    Differentiable w.r.t. the ray endpoints: crossing parameters are smooth
    functions of source/target; the voxel lookup is piecewise constant
    (the standard subgradient used by differentiable Siddon renderers,
    cf. DiffDRR, arXiv:2208.12737).
    """
    nx, ny, nz = density.shape
    if n_steps is None:
        n_steps = nx + ny + nz + 3

    s_vox = _apply_affine(affine_inverse, source)
    t_vox = _apply_affine(affine_inverse, target)
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)

    a_in, a_out = _aabb_alphas(s_vox, d, density.shape)

    safe_d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    # Per-axis parametric step between consecutive plane crossings
    dalpha = 1.0 / jnp.abs(safe_d)  # (B, R, 3)
    # First plane crossing strictly after a_in, per axis: planes at i + 0.5
    pos_in = s_vox + a_in[..., None] * d
    next_plane = jnp.where(
        d >= 0, jnp.floor(pos_in - 0.5) + 1.5, jnp.ceil(pos_in + 0.5) - 1.5
    )
    a_axis = (next_plane - s_vox) / safe_d  # (B, R, 3)
    a_axis = jnp.where(jnp.abs(d) < 1e-12, jnp.inf, a_axis)

    n_channels = 1 if (mask is None or labels is None) else 1 + len(labels)
    accum0 = jnp.zeros((n_channels,) + a_in.shape, dtype=density.dtype)
    flat = density.reshape(-1)

    def body(carry, _):
        alpha, a_axis, accum = carry
        a_next = jnp.minimum(jnp.min(a_axis, axis=-1), a_out)
        seg = jnp.maximum(a_next - alpha, 0.0)
        midpt = s_vox + (0.5 * (alpha + a_next))[..., None] * d
        idx = jnp.round(midpt).astype(jnp.int32)
        valid = seg > 0
        flat_idx = (
            jnp.clip(idx[..., 0], 0, nx - 1) * (ny * nz)
            + jnp.clip(idx[..., 1], 0, ny - 1) * nz
            + jnp.clip(idx[..., 2], 0, nz - 1)
        )
        val = jnp.take(flat, flat_idx)
        contrib = jnp.where(valid, val * seg, 0.0)
        if n_channels == 1:
            accum = accum + contrib[None]
        else:
            lab = nearest_label(mask, midpt)
            w = _channel_weights(lab, labels)  # (B, R, C)
            accum = accum + jnp.moveaxis(contrib[..., None] * w, -1, 0)
        # Advance every axis whose crossing we just consumed
        a_axis = jnp.where(a_axis <= a_next[..., None] + 1e-9, a_axis + dalpha, a_axis)
        alpha = jnp.maximum(alpha, a_next)
        return (alpha, a_axis, accum), None

    (_, _, accum), _ = jax.lax.scan(
        body, (a_in, a_axis, accum0), None, length=n_steps, unroll=unroll
    )
    img = accum * raylen[None]
    if n_channels == 1:
        return img[0]
    return jnp.moveaxis(img, 0, 1)  # (B, C, R)

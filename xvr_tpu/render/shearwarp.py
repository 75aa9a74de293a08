"""Shear-warp DRR rendering on the MXU.

The slab-marching Pallas kernel (:mod:`xvr_tpu.render.pallas`) is VPU-bound:
every slab costs ``window`` 128-wide gathers per detector tile, and the VPU
tops out around 170 256^2 DRRs/s. This module reformulates the same integral
so the hot loop is **matrix multiplies on the MXU** (~200 bf16 TFLOP/s on
v5e), via a perspective shear-warp factorization (Lacroute & Levoy's shear-
warp, generalized to cone beam geometry):

1. **Slope space.** Parametrize rays by their reduced slopes
   ``u = d_win / d_march``, ``v = d_lane / d_march`` (a point source makes
   this a bijection detector->slopes, a homography). At volume slab
   ``m = k`` the ray with slopes (u, v) sits at
   ``w = s_win + (k - s_march) * u``, ``l = s_lane + (k - s_march) * v`` —
   AFFINE in (u, v) with a per-slab scalar scale ``k - s_march``.
2. **Separable resample = two band matmuls.** On a regular (u, v) grid the
   slab's bilinear resample factorizes: ``samp_k = A_k @ S_k @ B_k^T`` with
   ``A_k[i, w] = hat(s_win + (k - s_march) u_i - w)`` (and B alike) — dense
   bf16 matmuls that run at MXU speed (the hat matrices are 2-banded, but
   MXU FLOPs are ~50x cheaper than VPU gathers, so dense wins). Summing
   over k builds the DRR in slope space: ~2 * Iu * Wd * Iv * M FLOPs
   (~17 GFLOP for 256^2 @ 256^3 — ~0.1 ms at MXU speed of light).
3. **Warp.** One cheap Pallas bilinear resample maps the slope-space image
   to detector pixels (the homography), times the per-ray path-length scale
   ``raylen / |d_march|`` — identical to the slab kernel's ``wscale``.

Accuracy: exact at slope-grid points; between grid points the transverse
position is bilinearly interpolated (extra smoothing on the order of one
slope cell ~ one detector pixel). Boundary semantics follow the XLA golden
model (out-of-grid corners contribute zero via the hat support); the
source-to-target [0, 1] clip is NOT applied — valid whenever the volume lies
between source and detector, which C-arm geometry guarantees.

Gradients: the shear-warp forward is paired with the slab kernel's analytic
backward in :func:`raymarch_trilinear_fast` (both discretize the same line
integral to O(h^2), so the VJP is a consistent gradient for the fast
forward). :func:`raymarch_trilinear_shearwarp` alone is forward-only.

**Interpolation profiles.** The transverse resample uses a trapezoid "hat"
``hat_eps(x) = clip(((1 + eps)/2 - |x|) / eps, 0, 1)`` of unit mass:

* ``eps = 1`` is the tent function — exactly trilinear interpolation.
* ``eps -> 0`` is the unit box — nearest-neighbor, i.e. the **Siddon**
  piecewise-constant model (the accumulate already samples the volume at
  integer march planes, where trilinear and piecewise-constant agree along
  the march axis, so the transverse profile is the ONLY difference between
  the two renderer families). :func:`raymarch_siddon_fast` uses a small
  ``eps`` (default 0.25): the forward matches exact Siddon up to an
  ``eps/2``-voxel transverse smoothing, and stays honestly differentiable —
  the analytic adjoint is the exact gradient of the smoothed forward.

**Labelmap channels.** ``mask``/``labels`` split the integral into
``C = 1 + len(labels)`` channels (channel 0 = structures outside the
requested labels, matching the background channel of the XLA golden
renderer). Internally the stack renders [full density, per-label volumes]
and emits the background by linear subtraction after the warp — so each
compact label channel marches only its static bounding slab range
(:func:`channel_slab_bounds`), cutting the accumulate cost from C dense
passes to 1 + sum of label extents. The channel images share one set of
warp coordinates, so channels fold into the batch axis of the warp kernel;
everything stays on the MXU.
Boundary semantics vs the golden model: the golden renderer assigns each
sample's full trilinear value to its nearest label, while the masked-volume
split interpolates each channel's own density — they differ only within one
voxel of label boundaries, and their channel sums both equal the unmasked
render.

Replaces both renderer families of the reference's math core
(``--renderer {trilinear,siddon}``, /root/reference/src/xvr/config/trainer.py:9)
as the TPU throughput path, including the masked (foundation-training)
workload of /root/reference/src/xvr/model/trainer.py:288-293.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas import LANE, SUB, _barrel_shear, _gather_halves, _pack_pairs, _shear_pad, _unpack

MAX_LANE_HALVES = 12  # warp gather reaches Iv <= MAX_LANE_HALVES * 128 (1536)


def prepare_shearwarp(
    density: jnp.ndarray,
    perm: tuple[int, int, int],
    mask: jnp.ndarray | None = None,
    labels: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """Permute a density grid to (march, window, lane) order and cast bf16.

    With ``mask``/``labels``, returns per-channel volumes (C, M, Wd, L) with
    C = 1 + len(labels): channel 0 is the FULL density, channels 1.. are the
    per-label masked densities. The renderers emit the public [background,
    labels...] channels by subtracting the label sum from the full render
    (exact: the integral is linear and labels are disjoint).

    O(volume) work — hoist out of optimization loops and pass via the
    ``prepared`` argument of the render functions.
    """
    vol = jnp.transpose(density, perm).astype(jnp.bfloat16)
    if mask is None or labels is None:
        return vol
    m = jnp.transpose(mask, perm)
    fg = jnp.stack([m == l for l in labels])  # (L, M, Wd, Ln)
    # channel 0 holds the FULL density (not the background): the renderers
    # emit bg = full - sum(labels) by linear subtraction after the warp, so
    # compact label channels can march only their bounding slabs
    # (channel_slab_bounds) while the public [bg, fg...] contract holds.
    return jnp.concatenate([vol[None], vol[None] * fg.astype(jnp.bfloat16)])


def channel_slab_bounds(
    mask, labels: tuple[int, ...], perm: tuple[int, int, int], quantum: int = 16
) -> tuple[tuple[int, int], ...]:
    """Static per-channel march-axis bounds for a channel render.

    Host-side NumPy. Channel 0 (the full density) spans every slab; each
    label channel gets the [k0, k1) bounding range of its voxels along the
    permuted march axis, padded to ``quantum`` so near-identical masks reuse
    compiled executables. Slabs outside a label's range contribute exactly
    zero to its accumulate and are skipped.
    """
    m = np.transpose(np.asarray(jax.device_get(mask)), perm)
    M = m.shape[0]
    out = [(0, M)]
    for l in labels:
        hit = np.flatnonzero(np.any(m == l, axis=(1, 2)))
        if hit.size == 0:
            out.append((0, min(quantum, M)))
            continue
        k0 = int(hit[0]) // quantum * quantum
        k1 = min(M, -(-(int(hit[-1]) + 1) // quantum) * quantum)
        out.append((k0, k1))
    return tuple(out)


def _hat(x, eps: float):
    """Unit-mass trapezoid profile: tent at eps=1, box as eps -> 0."""
    return jnp.clip(((1.0 + eps) * 0.5 - jnp.abs(x)) / eps, 0.0, 1.0)


def _hat_prime(x, eps: float):
    """d hat/dx: -sign(x)/eps on the ramps (1-eps)/2 < |x| < (1+eps)/2."""
    ax = jnp.abs(x)
    on_ramp = (ax > (1.0 - eps) * 0.5) & (ax < (1.0 + eps) * 0.5)
    return jnp.where(on_ramp, -jnp.sign(x) / eps, 0.0)


def _grid_transform(lo, hi, n: int, eps: float = 1e-6):
    """Slope-grid origin/step covering [lo, hi] with a 2-cell interior margin
    (keeps every warp coordinate >= 2 cells from the grid edge, away from the
    zero-padding boundary)."""
    step = jnp.maximum(hi - lo, eps) / (n - 5)
    return lo - 2.0 * step, step


@partial(jax.jit, static_argnames=("Iu", "Iv", "unroll", "eps", "k0", "k1"))
def _accumulate(vol, s_p, sgn, u0, du, v0, dv, *, Iu: int, Iv: int, unroll: int = 8, eps: float = 1.0, k0: int = 0, k1: int | None = None):
    """Slope-space accumulation: I[b, i, j] = sum_k w_k (A_k S_k B_k^T)[i, j].

    ``vol`` (M, Wd, L) bf16 permuted density; ``s_p`` (B, 3) permuted source
    voxel coords; ``sgn`` (B,) the march-axis sign of the ray directions —
    ``w_k = clip(sgn * (k - s_march) + 0.5, 0, 1)`` restricts the integral to
    the source's forward side (the alpha >= 0 half of the reference's
    [0, 1] clip; the alpha <= 1 end is the detector, behind the volume in any
    C-arm geometry). Returns (B, Iu, Iv) f32. The k-loop is a scan over
    ``unroll``-slab chunks so the f32 accumulator round-trips HBM once per
    chunk instead of once per slab.

    Static ``[k0, k1)`` bounds restrict the march to a slab sub-range — for
    label channels whose support is a compact bounding box, the slabs outside
    contribute exactly zero and are skipped (see :func:`channel_slab_bounds`).
    """
    M, Wd, L = vol.shape
    if k1 is None:
        k1 = M
    vol = jax.lax.slice_in_dim(vol, k0, k1, axis=0)
    M = k1 - k0
    B = s_p.shape[0]
    f32 = jnp.float32
    iu = jnp.arange(Iu, dtype=f32)
    iv = jnp.arange(Iv, dtype=f32)
    iw = jnp.arange(Wd, dtype=f32)
    il = jnp.arange(L, dtype=f32)
    u = u0[:, None] + du[:, None] * iu  # (B, Iu) slope of grid row i
    v = v0[:, None] + dv[:, None] * iv  # (B, Iv)
    s0, s1, s2 = s_p[:, 0], s_p[:, 1], s_p[:, 2]

    nsteps = -(-M // unroll)
    padM = nsteps * unroll - M
    volp = jnp.pad(vol, ((0, padM), (0, 0), (0, 0))) if padM else vol

    def body(acc, kc):
        chunk = jax.lax.dynamic_slice_in_dim(volp, kc * unroll, unroll, axis=0)
        for kk in range(unroll):
            k = (k0 + kc * unroll + kk).astype(f32)
            c = k - s0  # (B,) per-slab scale
            w_pos = s1[:, None] + c[:, None] * u  # (B, Iu)
            l_pos = s2[:, None] + c[:, None] * v  # (B, Iv)
            wk = jnp.clip(sgn * c + 0.5, 0.0, 1.0)  # forward-side slab weight
            Aw = _hat(w_pos[..., None] - iw, eps).astype(jnp.bfloat16)
            Aw = Aw * wk[:, None, None].astype(jnp.bfloat16)
            Bl = _hat(l_pos[..., None] - il, eps).astype(jnp.bfloat16)
            T = jnp.einsum("biw,wl->bil", Aw, chunk[kk], preferred_element_type=f32)
            acc = acc + jnp.einsum(
                "bil,bjl->bij", T.astype(jnp.bfloat16), Bl, preferred_element_type=f32
            )
        return acc, None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((B, Iu, Iv), f32), jnp.arange(nsteps, dtype=jnp.int32)
    )
    return acc


def _acc_kernel(params_ref, chunk_ref, out_ref, *, ku, bt, Iu, Iv, Wdp, Lp, eps, k0):
    """Fused slope-space accumulate: one (b-tile, k-chunk) program.

    Builds the per-slab hat matrices in VMEM and feeds them straight to the
    MXU, so neither the (Iu, Wd)/(Iv, L) hat factors nor the (Iu, L) partial
    product ever round-trip HBM (the XLA :func:`_accumulate` materializes all
    three per slab — its runtime is operand streaming, not FLOPs). The output
    block revisits across the inner k grid dimension and accumulates in VMEM.
    """
    f32 = jnp.float32
    kbase = (k0 + pl.program_id(1) * ku).astype(f32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def slab(kk, carry):
        kf = kbase + kk.astype(f32)
        sl = chunk_ref[kk]  # (Wdp, Lp) bf16
        for i in range(bt):
            s0, s1, s2 = params_ref[i, 0], params_ref[i, 1], params_ref[i, 2]
            sgn, u0, du = params_ref[i, 3], params_ref[i, 4], params_ref[i, 5]
            v0, dv = params_ref[i, 6], params_ref[i, 7]
            c = kf - s0
            wk = jnp.clip(sgn * c + 0.5, 0.0, 1.0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (Iu, Wdp), 0).astype(f32)
            ww = jax.lax.broadcasted_iota(jnp.int32, (Iu, Wdp), 1).astype(f32)
            aw = (_hat(s1 + c * (u0 + du * ii) - ww, eps) * wk).astype(jnp.bfloat16)
            jj = jax.lax.broadcasted_iota(jnp.int32, (Iv, Lp), 0).astype(f32)
            ll = jax.lax.broadcasted_iota(jnp.int32, (Iv, Lp), 1).astype(f32)
            bl = _hat(s2 + c * (v0 + dv * jj) - ll, eps).astype(jnp.bfloat16)
            t = jax.lax.dot_general(
                aw, sl, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
            out_ref[i] += jax.lax.dot_general(
                t.astype(jnp.bfloat16), bl, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        return carry

    jax.lax.fori_loop(0, ku, slab, 0)


@partial(jax.jit, static_argnames=("Iu", "Iv", "unroll", "eps", "k0", "k1", "bt", "interpret"))
def _accumulate_fused(vol, s_p, sgn, u0, du, v0, dv, *, Iu, Iv, unroll=8, eps=1.0,
                      k0: int = 0, k1: int | None = None, bt: int = 8, interpret=False):
    """Pallas version of :func:`_accumulate` — same contract, same math."""
    M, Wd, L = vol.shape
    if k1 is None:
        k1 = M
    vol = jax.lax.slice_in_dim(vol, k0, k1, axis=0)
    M = k1 - k0
    B = s_p.shape[0]
    ku = int(unroll)
    nsteps = -(-M // ku)
    Lp = -(-L // 128) * 128
    Wdp = -(-Wd // 16) * 16
    volp = jnp.pad(vol, ((0, nsteps * ku - M), (0, Wdp - Wd), (0, Lp - L)))
    Bp = -(-B // bt) * bt
    params = jnp.stack(
        [s_p[:, 0], s_p[:, 1], s_p[:, 2], sgn, u0, du, v0, dv], axis=1
    ).astype(jnp.float32)
    if Bp != B:
        params = jnp.pad(params, ((0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        partial(_acc_kernel, ku=ku, bt=bt, Iu=Iu, Iv=Iv, Wdp=Wdp, Lp=Lp,
                eps=float(eps), k0=int(k0)),
        grid=(Bp // bt, nsteps),
        in_specs=[
            pl.BlockSpec((bt, 8), lambda b, k: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ku, Wdp, Lp), lambda b, k: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, Iu, Iv), lambda b, k: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Iu, Iv), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, volp)
    return out[:B]


# VMEM budget for the fused kernel's resident blocks (accumulator + double-
# buffered volume chunk + hat/partial temporaries), conservatively capped
# well under the 128 MB/core so Mosaic keeps pipelining headroom.
_FUSED_VMEM_BUDGET = 72 * 1024 * 1024


def _fused_tile(vol_shape, Iu, Iv, unroll, B):
    """Image-tile size bt for the fused kernel, or None for the XLA fallback.

    Measured dispatch rule (TPU v5e, see docs/performance.md): the fused
    kernel wins ONLY at small pose batches — the registration regime, where
    bt is matched to B so a single pose doesn't pay for an 8-row tile
    (B=1: fwd 0.93 vs 1.93 ms, adj 1.06 vs 3.13 ms against the XLA scan at
    128^2 grids). At training/render batches (B >= ~8) the XLA scan's
    operand streaming pipelines better than the fused revisit pattern
    (B=116: adj 13.1 vs 24.4 ms) — so large batches take the scan.
    Mosaic also requires the SMEM param block's leading dim to divide 8 or
    equal the array dim, which bt=B satisfies for B < 8.
    ``XVR_NO_FUSED=1`` forces the XLA path everywhere (A/B + fallback)."""
    import os

    if os.environ.get("XVR_NO_FUSED"):
        return None
    if B >= 8 or Iu % 8 != 0 or Iv % 128 != 0:
        return None
    M, Wd, L = vol_shape[-3:]
    Lp = -(-L // 128) * 128
    Wdp = -(-Wd // 16) * 16
    fixed = (
        2 * unroll * Wdp * Lp * 2  # double-buffered chunk
        + Iu * Wdp * 2 + Iv * Lp * 2 + Iu * Lp * 4  # aw, bl, t temporaries
    )
    bt = int(B)
    if fixed + bt * Iu * Iv * 4 <= _FUSED_VMEM_BUDGET:
        return bt
    return None


def _accumulate_any(vol, s_p, sgn, u0, du, v0, dv, *, Iu, Iv, unroll=8, eps=1.0,
                    bounds=None, interpret=False):
    """:func:`_accumulate` over a leading channel axis when ``vol`` is a
    (C, M, Wd, L) per-channel stack. Returns (B, Iu, Iv) or (C, B, Iu, Iv).

    Channels run as separate accumulates (not vmap): each channel takes its
    own static slab ``bounds[c]`` so compact label channels skip the slabs
    outside their bounding box entirely.

    Dispatches to the fused Pallas kernel (:func:`_accumulate_fused`) when the
    blocks fit its VMEM budget; the XLA scan is the fallback for oversized
    grids/volumes.
    """
    kw = dict(Iu=Iu, Iv=Iv, unroll=unroll, eps=eps)
    bt = None if interpret else _fused_tile(vol.shape, Iu, Iv, unroll, s_p.shape[0])
    acc_fn = _accumulate if bt is None else partial(_accumulate_fused, bt=bt)
    if vol.ndim == 4:
        C, M = vol.shape[0], vol.shape[1]
        if bounds is None:
            bounds = ((0, M),) * C
        return jnp.stack([
            acc_fn(vol[c], s_p, sgn, u0, du, v0, dv,
                   k0=int(bounds[c][0]), k1=int(bounds[c][1]), **kw)
            for c in range(C)
        ])
    return acc_fn(vol, s_p, sgn, u0, du, v0, dv, **kw)


def _warp_kernel(uc, vc, ws, table, out, *, Iu, Iv, H, window):
    """Bilinear sample of the slope image at (uc, vc), scaled by ws.

    One (8, 128) detector tile per program; the image rows live in the
    bf16-pair packed ``table`` (this image's (Iu * H, 128) block). Same
    windowed-gather structure as the slab kernel, but with a single "slab"
    (the 2D slope image), so the whole warp costs ~window gathers per tile.
    """
    u_, v_, ws_ = uc[0], vc[0], ws[0]
    valid = (u_ > -1.0) & (u_ < Iu) & (v_ >= 0.0) & (v_ <= Iv - 1.0) & (ws_ > 0.0)
    u_for_min = jnp.where(valid, u_, 3.4e38)
    z0 = jnp.floor(jnp.min(u_for_min)).astype(jnp.int32)
    z0 = jnp.clip(z0, 0, max(Iu - window, 0))

    idx = jnp.clip(v_.astype(jnp.int32), 0, Iv - 2 if Iv > 1 else 0)
    fx = jnp.clip(v_ - idx.astype(jnp.float32), 0.0, 1.0)

    win = table[pl.ds(z0 * H, window * H), :]
    acc = jnp.zeros((SUB, LANE), jnp.float32)
    for d in range(window):
        zr = z0 + d
        wz = jnp.maximum(1.0 - jnp.abs(u_ - zr.astype(jnp.float32)), 0.0)
        g = _gather_halves(
            lambda h: jnp.broadcast_to(win[d * H + h][None, :], (SUB, LANE)),
            idx, H,
        )
        lo, hi = _unpack(g)
        val = lo + fx * (hi - lo)
        acc = acc + jnp.where(valid, wz, 0.0) * val
    out[0] = acc * ws_


def _warp_grads_kernel(uc, vc, ws, table, out, dudref, dvdref, *, Iu, Iv, H, window):
    """Warp + partials: (bilerp, d bilerp/d uc, d bilerp/d vc) per pixel.

    Same gather structure as :func:`_warp_kernel`; ``ws`` participates only in
    the validity mask (the path-length scale is applied by the caller)."""
    u_, v_, ws_ = uc[0], vc[0], ws[0]
    valid = (u_ > -1.0) & (u_ < Iu) & (v_ >= 0.0) & (v_ <= Iv - 1.0) & (ws_ > 0.0)
    u_for_min = jnp.where(valid, u_, 3.4e38)
    z0 = jnp.floor(jnp.min(u_for_min)).astype(jnp.int32)
    z0 = jnp.clip(z0, 0, max(Iu - window, 0))

    idx = jnp.clip(v_.astype(jnp.int32), 0, Iv - 2 if Iv > 1 else 0)
    fx = jnp.clip(v_ - idx.astype(jnp.float32), 0.0, 1.0)

    win = table[pl.ds(z0 * H, window * H), :]
    acc = jnp.zeros((SUB, LANE), jnp.float32)
    dua = jnp.zeros((SUB, LANE), jnp.float32)
    dva = jnp.zeros((SUB, LANE), jnp.float32)
    vmask = valid.astype(jnp.float32)
    for d in range(window):
        zr = z0 + d
        diff = u_ - zr.astype(jnp.float32)
        wz = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
        dz = jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)
        g = _gather_halves(
            lambda h: jnp.broadcast_to(win[d * H + h][None, :], (SUB, LANE)),
            idx, H,
        )
        lo, hi = _unpack(g)
        val = lo + fx * (hi - lo)
        acc = acc + vmask * wz * val
        dua = dua + vmask * dz * val
        dva = dva + vmask * wz * (hi - lo)
    out[0] = acc
    dudref[0] = dua
    dvdref[0] = dva


@partial(jax.jit, static_argnames=("det_shape", "grid_shape", "window", "interpret", "remap"))
def _warp_with_grads(I, uc, vc, ws, *, det_shape, grid_shape, window, interpret, remap=False):
    """(bilerp, d/duc, d/dvc) each (B, Hd * Wdet); no ws scaling applied."""
    if remap:
        return _warp_sheared(
            lambda u, v, w, ds: _warp_with_grads(
                I, u, v, w, det_shape=ds, grid_shape=grid_shape,
                window=window, interpret=interpret, remap=False,
            ),
            3, uc, vc, ws, det_shape=det_shape,
        )
    B = I.shape[0]
    Iu, Iv = grid_shape
    Hd, Wdet = det_shape
    H = -(-Iv // LANE)
    if H > MAX_LANE_HALVES:
        raise ValueError(f"slope grid lane extent {Iv} > {MAX_LANE_HALVES * LANE}")
    table = _pack_pairs(I)
    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE

    def prep(x):
        x = x.reshape(B, Hd, Wdet)
        return jnp.pad(x, ((0, 0), (0, Hp - Hd), (0, Wp - Wdet)))

    ray_spec = pl.BlockSpec((1, SUB, LANE), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((Iu * H, LANE), lambda b, i, j: (b, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_warp_grads_kernel, Iu=Iu, Iv=Iv, H=H, window=window),
        grid=(B, Hp // SUB, Wp // LANE),
        in_specs=[ray_spec] * 3 + [tab_spec],
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)] * 3,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(prep(uc), prep(vc), prep(ws), table)
    return tuple(o[:, :Hd, :Wdet].reshape(B, Hd * Wdet) for o in outs)


def _warp_shear_shift(uc, det_shape, xp=jnp):
    """Per-column row shift (B, Wdet) flattening the warp's window coordinate.

    ``uc`` IS the warp's window coordinate (slope-grid row), ~affine over the
    detector; delegates to the slab kernel's shared estimator
    (:func:`xvr_tpu.render.pallas._shift_from_key`)."""
    from .pallas import _shift_from_key

    return _shift_from_key(uc, det_shape, xp=xp)


def _warp_sheared(warp_fn, n_out, uc, vc, ws, *, det_shape):
    """Run a warp callable on barrel-sheared ray fields and un-shear its
    outputs. ``warp_fn(uc, vc, ws, det_shape)`` must return ``n_out`` arrays
    of shape (B, Hd' * Wdet); zero-filled slots are invalid (ws = 0)."""
    Hd, Wdet = det_shape
    B = ws.shape[0]
    pad = _shear_pad(det_shape)
    shift = _warp_shear_shift(uc, det_shape)

    def go(x):
        img = x.reshape(B, Hd, Wdet)
        return _barrel_shear(img, shift, pad, Hd).reshape(B, (Hd + pad) * Wdet)

    outs = warp_fn(go(uc), go(vc), go(ws), (Hd + pad, Wdet))
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    undone = tuple(
        _barrel_shear(o.reshape(B, Hd + pad, Wdet), shift, pad, Hd, reverse=True)
        .reshape(B, Hd * Wdet)
        for o in outs
    )
    return undone if n_out > 1 else undone[0]


@partial(jax.jit, static_argnames=("det_shape", "grid_shape", "window", "interpret", "remap"))
def _warp(I, uc, vc, ws, *, det_shape, grid_shape, window, interpret, remap=False):
    """Warp slope image I (B, Iu, Iv) to the detector: (B, Hd * Wdet).

    ``remap=True`` barrel-shears the ray fields per column first so rolled
    poses keep a small per-tile gather window (size it with
    ``measured_warp_window(remap=True)``)."""
    if remap:
        return _warp_sheared(
            lambda u, v, w, ds: _warp(
                I, u, v, w, det_shape=ds, grid_shape=grid_shape,
                window=window, interpret=interpret, remap=False,
            ),
            1, uc, vc, ws, det_shape=det_shape,
        )
    B = I.shape[0]
    Iu, Iv = grid_shape
    Hd, Wdet = det_shape
    H = -(-Iv // LANE)
    if H > MAX_LANE_HALVES:
        raise ValueError(f"slope grid lane extent {Iv} > {MAX_LANE_HALVES * LANE}")
    table = _pack_pairs(I)  # (B * Iu * H, 128)

    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE

    def prep(x):
        x = x.reshape(B, Hd, Wdet)
        return jnp.pad(x, ((0, 0), (0, Hp - Hd), (0, Wp - Wdet)))

    ray_spec = pl.BlockSpec((1, SUB, LANE), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((Iu * H, LANE), lambda b, i, j: (b, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_warp_kernel, Iu=Iu, Iv=Iv, H=H, window=window),
        grid=(B, Hp // SUB, Wp // LANE),
        in_specs=[ray_spec] * 3 + [tab_spec],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(prep(uc), prep(vc), prep(ws), table)
    return out[:, :Hd, :Wdet].reshape(B, Hd * Wdet)


def _decompose(affine_inverse, source, target, perm):
    """World rays -> permuted voxel-space fields (shared with the slab path)."""
    march, win, lane = perm
    A = affine_inverse
    s_vox = jnp.matmul(source, A[:3, :3].T, precision="highest") + A[:3, 3]
    t_vox = jnp.matmul(target, A[:3, :3].T, precision="highest") + A[:3, 3]
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d_vox = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)
    s_p = jnp.stack([s_vox[..., march], s_vox[..., win], s_vox[..., lane]], axis=-1)
    d_p = jnp.stack([d_vox[..., march], d_vox[..., win], d_vox[..., lane]], axis=-1)
    wscale = raylen / jnp.clip(jnp.abs(d_p[..., 0]), 1e-6)
    return s_p, d_p, wscale


def _warp_folded(I, uc, vc, wscale, *, det_shape, grid_shape, window, interpret, remap=False):
    """Warp a (B, Iu, Iv) or channelled (C, B, Iu, Iv) slope image to the
    detector; channels fold into the warp's batch axis (identical warp
    coordinates per channel). Returns (B, R) or (B, C, R)."""
    kw = dict(det_shape=det_shape, grid_shape=grid_shape, window=window, interpret=interpret, remap=remap)
    if I.ndim == 3:
        return _warp(I, uc, vc, wscale, **kw)
    C, B = I.shape[0], I.shape[1]
    out = _warp(
        I.reshape(C * B, *I.shape[2:]),
        jnp.tile(uc, (C, 1)), jnp.tile(vc, (C, 1)), jnp.tile(wscale, (C, 1)),
        **kw,
    )
    return out.reshape(C, B, -1).transpose(1, 0, 2)


def _shearwarp_from_fields(
    prepared, s_p, d_p, wscale,
    *, det_shape, grid_shape, warp_window, unroll, interpret, eps=1.0,
    chan_bounds=None, warp_remap=False, grid_bounds=None,
):
    """Render from permuted voxel-space ray fields (s_p/d_p: (B, R, 3)).

    ``grid_bounds`` = (u0, du, v0, dv, sgn) overrides the per-call grid fit
    for ray-sharded renders (see :func:`shearwarp_grid_bounds`)."""
    Iu, Iv = grid_shape
    safe_d0 = jnp.where(jnp.abs(d_p[..., 0]) < 1e-6, 1e-6, d_p[..., 0])
    u = d_p[..., 1] / safe_d0  # (B, R)
    v = d_p[..., 2] / safe_d0
    if grid_bounds is None:
        u0, du = _grid_transform(jnp.min(u, axis=1), jnp.max(u, axis=1), Iu)
        v0, dv = _grid_transform(jnp.min(v, axis=1), jnp.max(v, axis=1), Iv)
        sgn = jnp.sign(jnp.mean(d_p[..., 0], axis=1))  # march direction per image
    else:
        u0, du, v0, dv, sgn = grid_bounds
    # point source: all rays share s_p; (B, 3)
    s_scalar = s_p[:, 0, :]
    I = _accumulate_any(
        prepared, s_scalar, sgn, u0, du, v0, dv, Iu=Iu, Iv=Iv, unroll=unroll,
        eps=eps, bounds=chan_bounds, interpret=interpret,
    )
    uc = (u - u0[:, None]) / du[:, None]
    vc = (v - v0[:, None]) / dv[:, None]
    return _warp_folded(
        I, uc, vc, wscale,
        det_shape=det_shape, grid_shape=(Iu, Iv),
        window=warp_window, interpret=interpret, remap=warp_remap,
    )


def default_grid_shape(det_shape: tuple[int, int]) -> tuple[int, int]:
    """Slope-grid resolution for a detector: detector-matched, padded to the
    MXU-friendly 128 quantum, capped at the warp gather's lane reach."""
    Hd, Wdet = det_shape
    Iu = min(max(-(-Hd // 128) * 128, 128), 1536)
    Iv = min(max(-(-Wdet // 128) * 128, 128), MAX_LANE_HALVES * LANE)
    return Iu, Iv


def raymarch_trilinear_shearwarp(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    det_shape: tuple[int, int] | None = None,
    perm: tuple[int, int, int] | None = None,
    prepared: jnp.ndarray | None = None,
    grid_shape: tuple[int, int] | None = None,
    warp_window: int = 48,
    unroll: int = 8,
    interpret: bool | None = None,
    mask: jnp.ndarray | None = None,
    labels: tuple[int, ...] | None = None,
    eps: float = 1.0,
    chan_bounds: tuple[tuple[int, int], ...] | None = None,
    warp_remap: bool = False,
    grid_bounds=None,
) -> jnp.ndarray:
    """Forward-only shear-warp trilinear DRR: (B, R) line integrals in mm
    ((B, C, R) with ``mask``/``labels``; ``chan_bounds`` from
    :func:`channel_slab_bounds` restricts label channels to their slabs).

    Same ray contract as :func:`xvr_tpu.render.pallas.raymarch_trilinear_pallas`
    (``source`` (B, 1, 3) — a point source is required — and ``target``
    (B, R, 3) world mm). ``warp_window`` bounds the per-tile slope-row span of
    the final warp; size it with :func:`measured_warp_window` for rolled poses.
    ``warp_remap`` barrel-shears the warp per column so rolled poses keep a
    small window — measure with ``measured_warp_window(remap=True)``.
    """
    if source.shape[-2] != 1:
        raise ValueError("shear-warp requires a point source: source (B, 1, 3)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, R = target.shape[0], target.shape[1]
    if det_shape is None:
        side = int(round(np.sqrt(R)))
        if side * side != R:
            raise ValueError("det_shape required for non-square ray grids")
        det_shape = (side, side)
    if perm is None:
        d_mean = np.asarray(
            jax.device_get(jnp.mean(target, axis=(0, 1)) - jnp.mean(source, axis=(0, 1)))
        )
        A = np.asarray(jax.device_get(affine_inverse))
        from .pallas import _choose_permutation

        perm = _choose_permutation(A[:3, :3] @ d_mean)
    if prepared is None:
        prepared = prepare_shearwarp(density, perm, mask=mask, labels=labels)
    if grid_shape is None:
        grid_shape = default_grid_shape(det_shape)
    s_p, d_p, wscale = _decompose(affine_inverse, source, target, perm)
    warp_window = min(int(warp_window), int(grid_shape[0]))
    out = _shearwarp_from_fields(
        prepared, s_p, d_p, wscale,
        det_shape=det_shape, grid_shape=tuple(int(x) for x in grid_shape),
        warp_window=warp_window, unroll=int(unroll), interpret=bool(interpret),
        eps=float(eps), chan_bounds=chan_bounds, warp_remap=bool(warp_remap),
        grid_bounds=grid_bounds,
    )
    if out.ndim == 3:  # channels [full, fg...] -> public [bg, fg...]
        out = out.at[:, 0].add(-jnp.sum(out[:, 1:], axis=1))
    return out


def raymarch_siddon_shearwarp(*args, eps: float = 0.25, **kwargs) -> jnp.ndarray:
    """Forward-only Siddon-flavored shear-warp render.

    The piecewise-constant (nearest-neighbor) Siddon model via the trapezoid
    profile at small ``eps`` — matches exact Siddon (the reference's
    ``--renderer siddon``, /root/reference/src/xvr/config/trainer.py:9) up to
    an eps/2-voxel transverse smoothing, at trilinear shear-warp speed.
    """
    return raymarch_trilinear_shearwarp(*args, eps=eps, **kwargs)


@partial(jax.jit, static_argnames=("perm", "det_shape", "Iu", "remap"))
def _warp_window_span(source, target, affine_inverse, *, perm, det_shape, Iu, remap):
    """Per-tile slope-row span (grid cells) of the final warp, ON DEVICE.

    The registrar re-measures windows per pyramid stage over K x 16 drift
    probes; at full resolution that is hundreds of millions of ray
    evaluations — host NumPy took seconds per stage and dominated warm
    batched registration. Here the whole measurement is one tiny jitted
    program; only the scalar span crosses back to the host.
    """
    Hd, Wdet = det_shape
    A = affine_inverse
    s = source @ A[:3, :3].T + A[:3, 3]
    t = target @ A[:3, :3].T + A[:3, 3]
    d = t - jnp.broadcast_to(s, t.shape)
    march, win, lane = perm
    d0 = jnp.where(jnp.abs(d[..., march]) < 1e-6, 1e-6, d[..., march])
    u = d[..., win] / d0  # (B, R)
    lo, hi = u.min(axis=1), u.max(axis=1)
    step = jnp.maximum(hi - lo, 1e-6) / (Iu - 5)
    uc = ((u - (lo - 2.0 * step)[:, None]) / step[:, None]).reshape(-1, Hd, Wdet)
    if remap:
        # simulate the barrel shear: place ray (r, c) at row r + shift[c]
        # (shift clipped to the static pad, exactly like _warp_sheared)
        pad = _shear_pad(det_shape)
        shift = jnp.clip(
            _warp_shear_shift(uc.reshape(-1, Hd * Wdet), det_shape), 0, pad
        ).astype(jnp.int32)
        B = uc.shape[0]
        b_ix = jnp.arange(B)[:, None, None]
        r_ix = jnp.arange(Hd)[None, :, None] + shift[:, None, :]
        c_ix = jnp.broadcast_to(jnp.arange(Wdet)[None, None, :], (B, Hd, Wdet))
        uc_s = jnp.zeros((B, Hd + pad, Wdet), uc.dtype).at[b_ix, r_ix, c_ix].set(uc)
        vmask = jnp.zeros((B, Hd + pad, Wdet), bool).at[b_ix, r_ix, c_ix].set(True)
        uc, Hd = uc_s, Hd + pad
    else:
        vmask = jnp.ones_like(uc, dtype=bool)
    ph, pw = (-Hd) % SUB, (-Wdet) % LANE
    if ph or pw:
        uc = jnp.pad(uc, ((0, 0), (0, ph), (0, pw)))
        vmask = jnp.pad(vmask, ((0, 0), (0, ph), (0, pw)))
    nh, nw = uc.shape[1] // SUB, uc.shape[2] // LANE
    tiles = uc.reshape(-1, nh, SUB, nw, LANE)
    tv = vmask.reshape(-1, nh, SUB, nw, LANE)
    big = jnp.where(tv, tiles, jnp.inf).min(axis=(2, 4))
    small = jnp.where(tv, tiles, -jnp.inf).max(axis=(2, 4))
    live = tv.any(axis=(2, 4))
    return jnp.max(jnp.where(live, small - big, 0.0))


def _warp_window_span_np(source, target, affine_inverse, *, perm, det_shape, Iu, remap):
    """Pure-NumPy twin of :func:`_warp_window_span` for one-shot host
    measurements (bench setup): the device version is op-by-op jnp — dozens
    of executable dispatches, each exposed to the tunnel's first-dispatch
    latency lottery (observed a 260 s stall on exactly this call)."""
    Hd, Wdet = det_shape
    A = np.asarray(affine_inverse, np.float64)
    s = np.asarray(source, np.float64) @ A[:3, :3].T + A[:3, 3]
    t = np.asarray(target, np.float64) @ A[:3, :3].T + A[:3, 3]
    d = t - np.broadcast_to(s, t.shape)
    march, win, lane = perm
    d0 = np.where(np.abs(d[..., march]) < 1e-6, 1e-6, d[..., march])
    u = d[..., win] / d0  # (B, R)
    lo, hi = u.min(axis=1), u.max(axis=1)
    step = np.maximum(hi - lo, 1e-6) / (Iu - 5)
    uc = ((u - (lo - 2.0 * step)[:, None]) / step[:, None]).reshape(-1, Hd, Wdet)
    if remap:
        pad = _shear_pad(det_shape)
        shift = np.clip(
            _warp_shear_shift(uc.reshape(-1, Hd * Wdet), det_shape, xp=np), 0, pad
        ).astype(np.int64)
        B = uc.shape[0]
        b_ix = np.arange(B)[:, None, None]
        r_ix = np.arange(Hd)[None, :, None] + shift[:, None, :]
        c_ix = np.broadcast_to(np.arange(Wdet)[None, None, :], (B, Hd, Wdet))
        uc_s = np.zeros((B, Hd + pad, Wdet), uc.dtype)
        vmask = np.zeros((B, Hd + pad, Wdet), bool)
        uc_s[b_ix, r_ix, c_ix] = uc
        vmask[b_ix, r_ix, c_ix] = True
        uc, Hd = uc_s, Hd + pad
    else:
        vmask = np.ones_like(uc, dtype=bool)
    ph, pw = (-Hd) % SUB, (-Wdet) % LANE
    if ph or pw:
        uc = np.pad(uc, ((0, 0), (0, ph), (0, pw)))
        vmask = np.pad(vmask, ((0, 0), (0, ph), (0, pw)))
    nh, nw = uc.shape[1] // SUB, uc.shape[2] // LANE
    tiles = uc.reshape(-1, nh, SUB, nw, LANE)
    tv = vmask.reshape(-1, nh, SUB, nw, LANE)
    big = np.where(tv, tiles, np.inf).min(axis=(2, 4))
    small = np.where(tv, tiles, -np.inf).max(axis=(2, 4))
    live = tv.any(axis=(2, 4))
    return float(np.max(np.where(live, small - big, 0.0)))


def measured_warp_window(
    source,
    target,
    affine_inverse,
    perm: tuple[int, int, int],
    det_shape: tuple[int, int],
    grid_shape: tuple[int, int] | None = None,
    remap: bool = False,
    host: bool = False,
) -> int:
    """EXACT per-tile slope-row span (grid cells) of the final warp for these
    rays — the ``warp_window`` needed so no tile's gather window clips.
    Accepts NumPy or device arrays; the measurement runs on device (same
    contract as :func:`xvr_tpu.render.pallas.measured_window_span`) unless
    ``host=True``, which runs the pure-NumPy twin — right for one-shot
    measurements over small probe sets (bench setup), wrong inside the
    registrar's per-stage loop (K x 16 probes at full resolution dominate
    warm batched registration on the host)."""
    if grid_shape is None:
        grid_shape = default_grid_shape(det_shape)
    span_fn = _warp_window_span_np if host else _warp_window_span
    args = (source, target, affine_inverse) if host else (
        jnp.asarray(source), jnp.asarray(target), jnp.asarray(affine_inverse)
    )
    span = span_fn(
        *args,
        perm=tuple(int(p) for p in perm),
        det_shape=(int(det_shape[0]), int(det_shape[1])),
        Iu=int(grid_shape[0]), remap=bool(remap),
    )
    return int(np.ceil(float(span))) + 3


@partial(jax.jit, static_argnames=("grid_shape", "det_shape", "row_chunk"))
def _warp_transpose(gw, uc, vc, *, grid_shape, det_shape, row_chunk: int = 8):
    """Adjoint of the bilinear warp: scatter detector cotangents to the grid.

    I_bar[b, i, j] = sum_p gw[p] hat(uc[p] - i) hat(vc[p] - j), computed as
    row-chunked dense matmuls (the same trick as the forward: the hat
    matrices are 2-banded but MXU FLOPs beat scatters by orders of
    magnitude). ~Iu * R * Iv * 2 FLOPs — about half a forward accumulate.
    """
    Iu, Iv = grid_shape
    Hd, Wdet = det_shape
    B = gw.shape[0]
    f32 = jnp.float32
    iu = jnp.arange(Iu, dtype=f32)
    iv = jnp.arange(Iv, dtype=f32)
    nchunks = -(-Hd // row_chunk)
    pad = nchunks * row_chunk - Hd

    def prep(x):
        x = x.reshape(B, Hd, Wdet)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x.reshape(B, nchunks, row_chunk * Wdet)

    gw_, uc_, vc_ = prep(gw), prep(uc), prep(vc)
    # zero padded rows through gw (uc/vc padding lands on hat support 0 anyway
    # only if outside the grid — force it via the weight instead)
    if pad:
        mask = jnp.zeros((nchunks, row_chunk), f32).at[:-1].set(1.0)
        mask = mask.at[-1, : row_chunk - pad].set(1.0)
        gw_ = gw_ * jnp.repeat(mask.reshape(1, nchunks, row_chunk), Wdet, axis=-1).reshape(
            1, nchunks, row_chunk * Wdet
        )

    def body(acc, args):
        g_c, u_c, v_c = args  # (B, RC*Wdet)
        Hu = jnp.maximum(1.0 - jnp.abs(u_c[..., None] - iu), 0.0).astype(jnp.bfloat16)
        Hv = jnp.maximum(1.0 - jnp.abs(v_c[..., None] - iv), 0.0).astype(jnp.bfloat16)
        Hu = Hu * g_c[..., None].astype(jnp.bfloat16)
        acc = acc + jnp.einsum("bpi,bpj->bij", Hu, Hv, preferred_element_type=f32)
        return acc, None

    acc, _ = jax.lax.scan(
        body,
        jnp.zeros((B, Iu, Iv), f32),
        (gw_.transpose(1, 0, 2), uc_.transpose(1, 0, 2), vc_.transpose(1, 0, 2)),
    )
    return acc


@partial(jax.jit, static_argnames=("Iu", "Iv", "unroll", "eps", "k0", "k1"))
def _accumulate_adjoint(vol, s_p, sgn, u0, du, v0, dv, Ibar, *, Iu, Iv, unroll=8, eps=1.0, k0: int = 0, k1: int | None = None):
    """d<I_bar, accumulate(...)>/d s_p — the analytic adjoint of
    :func:`_accumulate` w.r.t. the (permuted) source position.

    Mirrors the forward slab scan with 4 matmuls per slab (~2x forward cost)
    and no saved intermediates. The slope GRID (u0/du/v0/dv) and the
    forward-side weight w_k are treated as constants: the grid is a sampling
    choice, and w_k is 0/1 for every in-volume slab whenever the source lies
    outside the volume (C-arm geometry), so their subgradients vanish.
    Returns g_s (B, 3). Static ``[k0, k1)`` restricts the march to a slab
    sub-range exactly like the forward's bounds.
    """
    M, Wd, L = vol.shape
    if k1 is None:
        k1 = M
    vol = jax.lax.slice_in_dim(vol, k0, k1, axis=0)
    M = k1 - k0
    B = s_p.shape[0]
    f32 = jnp.float32
    iu = jnp.arange(Iu, dtype=f32)
    iv = jnp.arange(Iv, dtype=f32)
    iw = jnp.arange(Wd, dtype=f32)
    il = jnp.arange(L, dtype=f32)
    u = u0[:, None] + du[:, None] * iu  # (B, Iu)
    v = v0[:, None] + dv[:, None] * iv  # (B, Iv)
    s0, s1, s2 = s_p[:, 0], s_p[:, 1], s_p[:, 2]

    nsteps = -(-M // unroll)
    padM = nsteps * unroll - M
    volp = jnp.pad(vol, ((0, padM), (0, 0), (0, 0))) if padM else vol
    Ibar16 = Ibar.astype(jnp.bfloat16)

    def body(carry, kc):
        g0, g1, g2 = carry
        chunk = jax.lax.dynamic_slice_in_dim(volp, kc * unroll, unroll, axis=0)
        for kk in range(unroll):
            k = (k0 + kc * unroll + kk).astype(f32)
            c = k - s0
            wk = jnp.clip(sgn * c + 0.5, 0.0, 1.0)  # 0/1 for in-volume slabs
            w_pos = s1[:, None] + c[:, None] * u
            l_pos = s2[:, None] + c[:, None] * v
            dwu = w_pos[..., None] - iw  # (B, Iu, Wd)
            dlv = l_pos[..., None] - il  # (B, Iv, L)
            h = _hat(dwu, eps).astype(jnp.bfloat16)
            hp = _hat_prime(dwu, eps).astype(jnp.bfloat16)
            bl = _hat(dlv, eps).astype(jnp.bfloat16)
            blp = _hat_prime(dlv, eps).astype(jnp.bfloat16)
            S = chunk[kk]
            # dA path: GA = Ibar @ Bl @ S^T; g_wpos = wk * sum_w GA * hat'
            R1 = jnp.einsum("bij,bjl->bil", Ibar16, bl, preferred_element_type=f32)
            GA = jnp.einsum("bil,wl->biw", R1.astype(jnp.bfloat16), S, preferred_element_type=f32)
            g_wpos = wk[:, None] * jnp.einsum(
                "biw,biw->bi", GA, hp.astype(f32), preferred_element_type=f32
            )
            # dB path: GB = Ibar^T @ (A @ S); g_lpos = sum_l GB * hat'
            T2 = jnp.einsum("biw,wl->bil", h, S, preferred_element_type=f32)
            GB = jnp.einsum("bij,bil->bjl", Ibar16, T2.astype(jnp.bfloat16), preferred_element_type=f32)
            g_lpos = wk[:, None] * jnp.einsum(
                "bjl,bjl->bj", GB, blp.astype(f32), preferred_element_type=f32
            )
            g1 = g1 + jnp.sum(g_wpos, axis=1)
            g2 = g2 + jnp.sum(g_lpos, axis=1)
            g0 = g0 - jnp.einsum("bi,bi->b", g_wpos, u) - jnp.einsum("bj,bj->b", g_lpos, v)
        return (g0, g1, g2), None

    zero = jnp.zeros((B,), f32)
    (g0, g1, g2), _ = jax.lax.scan(
        body, (zero, zero, zero), jnp.arange(nsteps, dtype=jnp.int32)
    )
    return jnp.stack([g0, g1, g2], axis=-1)


def _adj_kernel(params_ref, chunk_ref, ibar_ref, gw_ref, gl_ref, *, ku, bt, Iu, Iv, Wdp, Lp, eps, k0):
    """Fused adjoint accumulate: per-slab hat/hat' factors built in VMEM, the
    four adjoint matmuls on the MXU, per-row reductions folded into two
    1 x N matmuls (reduction + transpose in one op). Outputs the per-row
    cotangent sums gw (bt, Iu) / gl (bt, Iv); the wrapper contracts them with
    the slope grid to the 3-vector source adjoint."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    kbase = (k0 + pl.program_id(1) * ku).astype(f32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        gw_ref[:] = jnp.zeros_like(gw_ref)
        gl_ref[:] = jnp.zeros_like(gl_ref)

    ones_w = jnp.ones((1, Wdp), f32)
    ones_l = jnp.ones((1, Lp), f32)

    def slab(kk, carry):
        kf = kbase + kk.astype(f32)
        sl = chunk_ref[kk]  # (Wdp, Lp) bf16
        for i in range(bt):
            s0, s1, s2 = params_ref[i, 0], params_ref[i, 1], params_ref[i, 2]
            sgn, u0, du = params_ref[i, 3], params_ref[i, 4], params_ref[i, 5]
            v0, dv = params_ref[i, 6], params_ref[i, 7]
            c = kf - s0
            wk = jnp.clip(sgn * c + 0.5, 0.0, 1.0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (Iu, Wdp), 0).astype(f32)
            ww = jax.lax.broadcasted_iota(jnp.int32, (Iu, Wdp), 1).astype(f32)
            dwu = s1 + c * (u0 + du * ii) - ww
            h = _hat(dwu, eps).astype(bf16)
            hp = _hat_prime(dwu, eps)
            jj = jax.lax.broadcasted_iota(jnp.int32, (Iv, Lp), 0).astype(f32)
            ll = jax.lax.broadcasted_iota(jnp.int32, (Iv, Lp), 1).astype(f32)
            dlv = s2 + c * (v0 + dv * jj) - ll
            bl = _hat(dlv, eps).astype(bf16)
            blp = _hat_prime(dlv, eps)
            ib = ibar_ref[i]  # (Iu, Iv) bf16
            # dA path: GA = (Ibar @ Bl) @ S^T; gw row = wk * sum_w GA * hat'
            r1 = jax.lax.dot_general(ib, bl, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            ga = jax.lax.dot_general(r1.astype(bf16), sl, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            gw_ref[pl.ds(i, 1), :] += wk * jax.lax.dot_general(
                ones_w, ga * hp, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            # dB path: GB = Ibar^T @ (A @ S); gl row = wk * sum_l GB * hat'
            t2 = jax.lax.dot_general(h, sl, (((1,), (0,)), ((), ())), preferred_element_type=f32)
            gb = jax.lax.dot_general(ib, t2.astype(bf16), (((0,), (0,)), ((), ())), preferred_element_type=f32)
            gl_ref[pl.ds(i, 1), :] += wk * jax.lax.dot_general(
                ones_l, gb * blp, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
        return carry

    jax.lax.fori_loop(0, ku, slab, 0)


@partial(jax.jit, static_argnames=("Iu", "Iv", "unroll", "eps", "k0", "k1", "bt", "interpret"))
def _accumulate_adjoint_fused(vol, s_p, sgn, u0, du, v0, dv, Ibar, *, Iu, Iv, unroll=8,
                              eps=1.0, k0: int = 0, k1: int | None = None, bt: int = 8,
                              interpret=False):
    """Pallas version of :func:`_accumulate_adjoint` — same contract/math."""
    M, Wd, L = vol.shape
    if k1 is None:
        k1 = M
    vol = jax.lax.slice_in_dim(vol, k0, k1, axis=0)
    M = k1 - k0
    B = s_p.shape[0]
    ku = int(unroll)
    nsteps = -(-M // ku)
    Lp = -(-L // 128) * 128
    Wdp = -(-Wd // 16) * 16
    volp = jnp.pad(vol, ((0, nsteps * ku - M), (0, Wdp - Wd), (0, Lp - L)))
    Bp = -(-B // bt) * bt
    params = jnp.stack(
        [s_p[:, 0], s_p[:, 1], s_p[:, 2], sgn, u0, du, v0, dv], axis=1
    ).astype(jnp.float32)
    ibar16 = Ibar.astype(jnp.bfloat16)
    if Bp != B:
        params = jnp.pad(params, ((0, Bp - B), (0, 0)))
        ibar16 = jnp.pad(ibar16, ((0, Bp - B), (0, 0), (0, 0)))
    gw, gl = pl.pallas_call(
        partial(_adj_kernel, ku=ku, bt=bt, Iu=Iu, Iv=Iv, Wdp=Wdp, Lp=Lp,
                eps=float(eps), k0=int(k0)),
        grid=(Bp // bt, nsteps),
        in_specs=[
            pl.BlockSpec((bt, 8), lambda b, k: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((ku, Wdp, Lp), lambda b, k: (k, 0, 0)),
            pl.BlockSpec((bt, Iu, Iv), lambda b, k: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, Iu), lambda b, k: (b, 0)),
            pl.BlockSpec((bt, Iv), lambda b, k: (b, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Iu), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Iv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(params, volp, ibar16)
    gw, gl = gw[:B], gl[:B]
    f32 = jnp.float32
    u = u0[:, None] + du[:, None] * jnp.arange(Iu, dtype=f32)
    v = v0[:, None] + dv[:, None] * jnp.arange(Iv, dtype=f32)
    g1 = jnp.sum(gw, axis=1)
    g2 = jnp.sum(gl, axis=1)
    g0 = -jnp.sum(gw * u, axis=1) - jnp.sum(gl * v, axis=1)
    return jnp.stack([g0, g1, g2], axis=-1)


def _pick_adjoint(vol_shape, Iu, Iv, unroll, interpret, B):
    """Fused Pallas adjoint at small batches; the XLA scan otherwise."""
    bt = None if interpret else _fused_tile(vol_shape, Iu, Iv, unroll, B)
    if bt is not None:
        return partial(_accumulate_adjoint_fused, bt=bt)
    return _accumulate_adjoint


# ---------------------------------------------------------------------------
# Fast differentiable path: shear-warp forward + analytic adjoint backward
# (or the slab kernel's VJP, selectable)
# ---------------------------------------------------------------------------


def _slope_pieces(d_p, Iu, Iv, bounds=None):
    """Per-ray slopes + the (stop-gradient) grid transform and coordinates.

    ``bounds`` (u0, du, v0, dv) overrides the per-call min/max grid fit —
    a ray-SHARDED render must use the bounds of the FULL detector so every
    shard warps from the identical slope grid (see
    :func:`shearwarp_grid_bounds`)."""
    safe_d0 = jnp.where(jnp.abs(d_p[..., 0]) < 1e-6, 1e-6, d_p[..., 0])
    u = d_p[..., 1] / safe_d0
    v = d_p[..., 2] / safe_d0
    if bounds is None:
        u0, du = _grid_transform(jnp.min(u, axis=1), jnp.max(u, axis=1), Iu)
        v0, dv = _grid_transform(jnp.min(v, axis=1), jnp.max(v, axis=1), Iv)
    else:
        u0, du, v0, dv = bounds
    u0, du, v0, dv = map(jax.lax.stop_gradient, (u0, du, v0, dv))
    uc = (u - u0[:, None]) / du[:, None]
    vc = (v - v0[:, None]) / dv[:, None]
    return safe_d0, u, v, u0, du, v0, dv, uc, vc


def shearwarp_grid_bounds(affine_inverse, source, target, *, perm, grid_shape):
    """Global slope-grid transform + march sign for a ray-sharded render.

    -> ``(u0, du, v0, dv, sgn)``, each ``(B,)``. Computed over the FULL
    detector's rays; pass as ``grid_bounds`` to the raymarch entry points so
    each ray shard accumulates and warps against the identical slope grid
    (bitwise-equal to the unsharded render)."""
    Iu, Iv = grid_shape
    s_p, d_p, _ = _decompose(affine_inverse, source, target, perm)
    _, _, _, u0, du, v0, dv, _, _ = _slope_pieces(d_p, Iu, Iv)
    sgn = jnp.sign(jnp.mean(d_p[..., 0], axis=1))
    return u0, du, v0, dv, sgn


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fast(cfg, prepared, packed_table, affine_inverse, source, target, grid_bounds):
    det_shape, vol_shape, grid_shape, warp_window, slab_window, perm, unroll, interpret, stream, backward, eps, chan_bounds, warp_remap = cfg
    s_p, d_p, wscale = _decompose(affine_inverse, source, target, perm)
    return _shearwarp_from_fields(
        prepared, s_p, d_p, wscale,
        det_shape=det_shape, grid_shape=grid_shape,
        warp_window=warp_window, unroll=unroll, interpret=interpret, eps=eps,
        chan_bounds=chan_bounds, warp_remap=warp_remap, grid_bounds=grid_bounds,
    )


def _fast_fwd(cfg, prepared, packed_table, affine_inverse, source, target, grid_bounds):
    det_shape, vol_shape, grid_shape, warp_window, slab_window, perm, unroll, interpret, stream, backward, eps, chan_bounds, warp_remap = cfg
    s_p, d_p, wscale = _decompose(affine_inverse, source, target, perm)
    Iu, Iv = grid_shape
    _, u, v, u0, du, v0, dv, uc, vc = _slope_pieces(
        d_p, Iu, Iv, bounds=None if grid_bounds is None else grid_bounds[:4]
    )
    sgn = (
        jnp.sign(jnp.mean(d_p[..., 0], axis=1))
        if grid_bounds is None else grid_bounds[4]
    )
    I = _accumulate_any(
        prepared, s_p[:, 0, :], sgn, u0, du, v0, dv, Iu=Iu, Iv=Iv, unroll=unroll,
        eps=eps, bounds=chan_bounds, interpret=interpret,
    )
    out = _warp_folded(
        I, uc, vc, wscale,
        det_shape=det_shape, grid_shape=grid_shape,
        window=warp_window, interpret=interpret, remap=warp_remap,
    )
    return out, (prepared, packed_table, affine_inverse, source, target, I, grid_bounds)


def _fast_bwd(cfg, res, g):
    """Analytic backward for the shear-warp forward.

    ``backward="shearwarp"`` (default) is the exact adjoint of the forward
    (modulo the stop-gradient slope-grid transform and the 0/1 forward-side
    weight): warp partials from a Pallas pass, the warp transpose as
    row-chunked matmuls, and the slab-scan adjoint for the source position —
    ~3x a forward, all on the MXU. Channel renders fold the channel axis into
    the warp batch and sum the source-position adjoints over channels.
    ``backward="slab"`` routes through the slab kernel's VJP instead (the
    O(h^2)-consistent gradient of the same integral; useful as a
    cross-check; single-channel only).
    """
    det_shape, vol_shape, grid_shape, warp_window, slab_window, perm, unroll, interpret, stream, backward, eps, chan_bounds, warp_remap = cfg
    prepared, packed_table, affine_inverse, source, target, I, grid_bounds = res
    g_bounds = (
        None if grid_bounds is None
        else tuple(jnp.zeros_like(b) for b in grid_bounds)
    )
    (s_p, d_p, wscale), light_vjp = jax.vjp(
        lambda src, tgt: _decompose(affine_inverse, src, tgt, perm), source, target
    )

    if backward == "slab":
        from .pallas import _core_bwd

        _, g_s, g_d, g_ws = _core_bwd(
            (det_shape, vol_shape, slab_window, interpret, stream),
            (packed_table, s_p, d_p, wscale),
            g,
        )
        g_src, g_tgt = light_vjp((g_s, g_d, g_ws))
        return None, None, jnp.zeros_like(affine_inverse), g_src, g_tgt, g_bounds

    Iu, Iv = grid_shape
    safe_d0, u, v, u0, du, v0, dv, uc, vc = _slope_pieces(
        d_p, Iu, Iv, bounds=None if grid_bounds is None else grid_bounds[:4]
    )
    sgn = (
        jnp.sign(jnp.mean(d_p[..., 0], axis=1))
        if grid_bounds is None else grid_bounds[4]
    )
    channels = I.ndim == 4
    if channels:
        C, B = I.shape[0], I.shape[1]
        If = I.reshape(C * B, Iu, Iv)
        ucf, vcf, wsf = (jnp.tile(x, (C, 1)) for x in (uc, vc, wscale))
        gf = g.transpose(1, 0, 2).reshape(C * B, -1)  # (B, C, R) -> folded
    else:
        If, ucf, vcf, wsf, gf = I, uc, vc, wscale, g
    bil, dWdu, dWdv = _warp_with_grads(
        If, ucf, vcf, wsf,
        det_shape=det_shape, grid_shape=grid_shape,
        window=warp_window, interpret=interpret, remap=warp_remap,
    )
    gwf = gf * wsf
    Ibar = _warp_transpose(gwf, ucf, vcf, grid_shape=grid_shape, det_shape=det_shape)
    adj_kw = dict(Iu=Iu, Iv=Iv, unroll=unroll, eps=eps)
    adjoint = _pick_adjoint(prepared.shape, Iu, Iv, unroll, interpret, s_p.shape[0])
    if channels:

        def csum(x):  # fold (C*B, R) partials back to per-ray sums over C
            return x.reshape(C, -1, x.shape[-1]).sum(axis=0)

        g_ws = csum(gf * bil)
        g_uc = csum(gwf * dWdu)
        g_vc = csum(gwf * dWdv)
        Ibar_c = Ibar.reshape(C, B, Iu, Iv)
        cb = chan_bounds if chan_bounds is not None else ((0, prepared.shape[1]),) * C
        g_s_scalar = sum(
            adjoint(
                prepared[c], s_p[:, 0, :], sgn, u0, du, v0, dv, Ibar_c[c],
                k0=int(cb[c][0]), k1=int(cb[c][1]), **adj_kw
            )
            for c in range(C)
        )
    else:
        g_ws = gf * bil
        g_uc = gwf * dWdu
        g_vc = gwf * dWdv
        g_s_scalar = adjoint(
            prepared, s_p[:, 0, :], sgn, u0, du, v0, dv, Ibar, **adj_kw
        )
    g_u = g_uc / du[:, None]
    g_v = g_vc / dv[:, None]
    g_d0 = -(g_u * d_p[..., 1] + g_v * d_p[..., 2]) / (safe_d0 * safe_d0)
    g_d = jnp.stack([g_d0, g_u / safe_d0, g_v / safe_d0], axis=-1)
    g_s = jnp.zeros_like(s_p).at[:, 0, :].set(g_s_scalar)
    g_src, g_tgt = light_vjp((g_s, g_d, g_ws))
    return None, None, jnp.zeros_like(affine_inverse), g_src, g_tgt, g_bounds


_fast.defvjp(_fast_fwd, _fast_bwd)


def raymarch_trilinear_fast(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    det_shape: tuple[int, int] | None = None,
    perm: tuple[int, int, int] | None = None,
    prepared: jnp.ndarray | None = None,
    packed=None,
    grid_shape: tuple[int, int] | None = None,
    warp_window: int = 48,
    slab_window: int = 32,
    unroll: int = 8,
    interpret: bool | None = None,
    backward: str = "shearwarp",
    mask: jnp.ndarray | None = None,
    labels: tuple[int, ...] | None = None,
    eps: float = 1.0,
    chan_bounds: tuple[tuple[int, int], ...] | None = None,
    warp_remap: bool = False,
    grid_bounds=None,
) -> jnp.ndarray:
    """Differentiable fast trilinear render, MXU forward AND backward.

    ``backward="shearwarp"`` (default) uses the analytic shear-warp adjoint —
    the exact gradient of the forward, ~3x a forward's cost.
    ``backward="slab"`` routes through the slab Pallas kernel's VJP instead
    (needs ``packed``, the pair-packed table from
    :func:`xvr_tpu.render.pallas.pack_density`, and a valid ``slab_window``
    for these poses — see ``Projector.measure_window``; single-channel only).
    ``prepared`` is the permuted bf16 volume from :func:`prepare_shearwarp` —
    a (C, M, Wd, L) per-channel stack (or ``mask``/``labels`` here) renders
    labelmap channels: output (B, C, R) instead of (B, R).
    """
    if source.shape[-2] != 1:
        raise ValueError("shear-warp requires a point source: source (B, 1, 3)")
    if backward not in ("shearwarp", "slab"):
        raise ValueError(f"unknown backward {backward!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, R = target.shape[0], target.shape[1]
    if det_shape is None:
        side = int(round(np.sqrt(R)))
        if side * side != R:
            raise ValueError("det_shape required for non-square ray grids")
        det_shape = (side, side)
    if perm is None:
        d_mean = np.asarray(
            jax.device_get(jnp.mean(target, axis=(0, 1)) - jnp.mean(source, axis=(0, 1)))
        )
        A = np.asarray(jax.device_get(affine_inverse))
        from .pallas import _choose_permutation

        perm = _choose_permutation(A[:3, :3] @ d_mean)
    if prepared is None:
        prepared = prepare_shearwarp(density, perm, mask=mask, labels=labels)
    if prepared.ndim == 4 and backward == "slab":
        raise ValueError("backward='slab' does not support channel rendering")
    vol_shape = tuple(int(x) for x in prepared.shape[-3:])
    stream = False
    if backward == "slab":
        from .pallas import STREAM_THRESHOLD, pack_density, packed_table_bytes

        if packed is None:
            packed = pack_density(density, perm)
        packed_table, vol_shape = packed
        stream = packed_table_bytes(vol_shape) > STREAM_THRESHOLD
    else:
        packed_table = jnp.zeros((0,), jnp.float32)  # unused
    if grid_shape is None:
        grid_shape = default_grid_shape(det_shape)
    slab_window = min(int(slab_window), int(vol_shape[1]))
    cfg = (
        tuple(int(x) for x in det_shape),
        tuple(int(x) for x in vol_shape),
        tuple(int(x) for x in grid_shape),
        min(int(warp_window), int(grid_shape[0])),
        slab_window,
        tuple(int(x) for x in perm),
        int(unroll),
        bool(interpret),
        bool(stream),
        str(backward),
        float(eps),
        tuple((int(a), int(b)) for a, b in chan_bounds) if chan_bounds is not None else None,
        bool(warp_remap),
    )
    out = _fast(cfg, prepared, packed_table, affine_inverse, source, target, grid_bounds)
    if out.ndim == 3:  # channels [full, fg...] -> public [bg, fg...]
        out = out.at[:, 0].add(-jnp.sum(out[:, 1:], axis=1))
    return out


def raymarch_siddon_fast(*args, eps: float = 0.25, **kwargs) -> jnp.ndarray:
    """Differentiable Siddon-flavored fast render (MXU forward + backward).

    :func:`raymarch_trilinear_fast` at a small trapezoid width: the forward
    matches exact Siddon up to eps/2-voxel transverse smoothing, and the
    analytic adjoint is the exact gradient of that smoothed forward (so
    finite-difference checks pass, unlike hard nearest-neighbor whose
    gradient is zero a.e.). Replaces ``--renderer siddon``
    (/root/reference/src/xvr/config/trainer.py:9) on the TPU throughput path.
    """
    return raymarch_trilinear_fast(*args, eps=eps, **kwargs)

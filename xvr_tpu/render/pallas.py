"""Pallas TPU kernel for trilinear DRR ray marching.

Why not XLA gather: a 256^2 DRR against a 256^3 CT needs ~1e9 random volume
reads; XLA lowers them to scalar gathers (~1.3e8/s on v5e -> ~1 DRR/s). This
kernel restructures the render around what the VPU can do fast:

* **Slab marching**: rays are integrated at their crossings with the volume
  planes along the dominant ray axis ("march" axis). Samples then sit exactly
  ON those planes, so interpolation is only bilinear in the two transverse
  axes.
* **Window-select** over the second ("window") axis: across an 8x128 detector
  tile the window coordinate spans only a few voxels per slab, so the kernel
  reads a small run of rows and folds the linear interpolation into a
  triangle weight per row.
* **Lane gather + pair packing** over the third ("lane") axis: the in-row
  lookup uses the VPU's 128-wide dynamic gather (`take_along_axis`), and each
  f32 word packs the (bf16) voxel pair (V[l], V[l+1]) so ONE gather yields
  both neighbors of the lane-axis lerp.
* The whole packed volume (<= ~67 MB for 256^3) lives in **VMEM** for the
  entire render — zero HBM traffic in the hot loop.

Geometry contract: the wrapper picks the march axis as the dominant mean ray
direction and permutes the volume accordingly; rays deviating more than ~45
degrees from the march axis (|d_march| < 0.5 |d|) or exceeding the static
window are not representable — callers should fall back to the XLA renderer
for such poses (see ``estimate_window_span``).

Replaces the trilinear renderer of the reference's math core (selected by
``--renderer trilinear``, /root/reference/src/xvr/config/trainer.py:9) as the
TPU fast path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8


def _pack_pairs(vol: jnp.ndarray) -> jnp.ndarray:
    """(M, Wd, L) f32 -> (M * Wd * H, 128) f32 of packed bf16 pairs.

    Lane l of half h holds (bf16(V[..., h*128+l]), bf16(V[..., h*128+l+1]))
    packed into one f32 word, so a single gather returns both lerp neighbors.
    """
    M, Wd, L = vol.shape
    H = -(-L // LANE)
    pad = H * LANE - L
    lo = vol
    hi = jnp.concatenate([vol[..., 1:], vol[..., -1:]], axis=-1)
    if pad:
        lo = jnp.pad(lo, ((0, 0), (0, 0), (0, pad)))
        hi = jnp.pad(hi, ((0, 0), (0, 0), (0, pad)))
    lo16 = jax.lax.bitcast_convert_type(lo.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    hi16 = jax.lax.bitcast_convert_type(hi.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = jax.lax.bitcast_convert_type((hi16 << 16) | lo16, jnp.float32)
    # (M, Wd, H, 128) -> rows (M*Wd*H, 128)
    packed = packed.reshape(M, Wd, H, LANE)
    return packed.reshape(M * Wd * H, LANE)


def _unpack(g: jnp.ndarray):
    u = pltpu.bitcast(g, jnp.uint32)
    lo = pltpu.bitcast((u & jnp.uint32(0xFFFF)) << 16, jnp.float32)
    hi = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
    return lo, hi


def _gather_halves(rows, idx, H):
    """Lane-axis gather across the H 128-lane halves of a packed row.

    ``rows(h)`` returns half ``h`` broadcast to (SUB, LANE); ``idx`` holds
    lane-axis voxel indices in [0, H*LANE). One 128-wide dynamic gather per
    half, merged with selects — this is what lets the kernels address lane
    extents beyond 256 (e.g. 512-wide CTs) correctly."""
    half = jnp.clip(idx // LANE, 0, H - 1)
    idx_in = idx - half * LANE
    g = jnp.take_along_axis(rows(0), jnp.where(half == 0, idx_in, 0), axis=1)
    for h in range(1, H):
        gh = jnp.take_along_axis(rows(h), jnp.where(half == h, idx_in, 0), axis=1)
        g = jnp.where(half == h, gh, g)
    return g


def _kernel(s0, s1, s2, d0, d1, d2, ws, table, out, *, M, Wd, H, L, window, K=None):
    """One (8, 128) detector tile: march the slabs, accumulate the DRR.

    K=None: the whole packed table is VMEM-resident and the tile marches all
    M slabs in one visit. K=int: STREAMING mode — the march is split into
    K-slab chunks forming the outermost grid dimension; ``table`` is this
    chunk's (K*Wd*H, 128) block (HBM->VMEM pipelined once per render, since
    its block index ignores the tile dims) and the output tile accumulates
    across chunk revisits. Streaming handles volumes far beyond VMEM
    (512^3 packs to ~537 MB) at the cost of one extra out-block round-trip
    per chunk."""
    stream = K is not None
    chunk = pl.program_id(0) if stream else None
    s0, s1, s2 = s0[0], s1[0], s2[0]
    d0, d1, d2 = d0[0], d1[0], d2[0]
    ws = ws[0]

    if stream:
        @pl.when(chunk == 0)
        def _():
            out[0] = jnp.zeros((SUB, LANE), jnp.float32)

    safe_d0 = jnp.where(jnp.abs(d0) < 1e-6, 1e-6, d0)
    inv_d0 = 1.0 / safe_d0
    half = 0.5 * jnp.abs(inv_d0)  # half slab thickness in alpha units

    # Per-ray AABB entry/exit (midpoint-rule trimming: without it, entry and
    # exit planes get a full slab weight and the integral biases ~1/M high/low)
    a_in = jnp.zeros_like(s0)
    a_out = jnp.ones_like(s0)
    for s_i, d_i, n_i in ((s0, d0, M), (s1, d1, Wd), (s2, d2, L)):
        safe = jnp.where(jnp.abs(d_i) < 1e-9, 1e-9, d_i)
        t1 = (-0.5 - s_i) / safe
        t2 = (n_i - 0.5 - s_i) / safe
        lo_t = jnp.minimum(t1, t2)
        hi_t = jnp.maximum(t1, t2)
        parallel = jnp.abs(d_i) < 1e-9
        inside = (s_i > -0.5) & (s_i < n_i - 0.5)
        lo_t = jnp.where(parallel, jnp.where(inside, -3e38, 3e38), lo_t)
        hi_t = jnp.where(parallel, jnp.where(inside, 3e38, -3e38), hi_t)
        a_in = jnp.maximum(a_in, lo_t)
        a_out = jnp.minimum(a_out, hi_t)
    a_out = jnp.maximum(a_out, a_in)

    def slab(k, acc):
        mf = ((chunk * K + k) if stream else k).astype(jnp.float32)
        alpha = (mf - s0) * inv_d0
        p1 = s1 + alpha * d1  # window coord
        p2 = s2 + alpha * d2  # lane coord
        # effective alpha span of this slab clipped to the in-volume segment
        w_alpha = jnp.maximum(
            jnp.minimum(alpha + half, a_out) - jnp.maximum(alpha - half, a_in), 0.0
        ) * jnp.abs(safe_d0)  # normalized so a full slab weighs 1.0
        valid = w_alpha > 0.0
        valid &= (p1 > -1.0) & (p1 < Wd)
        valid &= (p2 >= 0.0) & (p2 <= L - 1.0)
        valid &= ws > 0.0  # detector-padding rays carry zero weight scale

        # window base for this tile: floor(min valid p1)
        p1_for_min = jnp.where(valid, p1, 3.4e38)
        z0 = jnp.floor(jnp.min(p1_for_min)).astype(jnp.int32)
        z0 = jnp.clip(z0, 0, max(Wd - window, 0))

        idx = jnp.clip(p2.astype(jnp.int32), 0, L - 2 if L > 1 else 0)
        fx = jnp.clip(p2 - idx.astype(jnp.float32), 0.0, 1.0)

        def compute(acc):
            # ONE dynamic slice per slab: the whole window block (rows are
            # contiguous in the packed layout; k is block-relative when
            # streaming), then static row indexing
            base = (k * Wd + z0) * H
            win = table[pl.ds(base, window * H), :]

            def window_row(d, acc):
                zr = z0 + d
                # triangle weight folds the window-axis lerp; zr < Wd always
                # (z0 is clipped to Wd - window)
                wz = jnp.maximum(1.0 - jnp.abs(p1 - zr.astype(jnp.float32)), 0.0)
                g = _gather_halves(
                    lambda h: jnp.broadcast_to(win[d * H + h][None, :], (SUB, LANE)),
                    idx, H,
                )
                lo, hi = _unpack(g)
                v = lo + fx * (hi - lo)
                w = jnp.where(valid, wz * w_alpha, 0.0)
                return acc + w * v

            for d in range(window):
                acc = window_row(d, acc)
            return acc

        # skip slabs the tile's frustum never touches
        return jax.lax.cond(jnp.any(valid), compute, lambda a: a, acc)

    zero = jnp.zeros((SUB, LANE), jnp.float32)
    # tiles with no live rays (e.g. shear-remap padding) skip the whole march
    acc = jax.lax.cond(
        jnp.any(ws > 0.0),
        lambda _: jax.lax.fori_loop(0, K if stream else M, slab, zero),
        lambda _: zero,
        None,
    )
    if stream:
        out[0] += acc * ws
    else:
        out[0] = acc * ws


def _kernel_siddon(s0, s1, s2, d0, d1, d2, ws, table, out, *, M, Wd, H, L, window, K=None):
    """Exact Siddon forward kernel (piecewise-constant voxel model).

    Within one march slab the ray crosses at most ONE window plane and ONE
    lane plane (guaranteed while |d_win|,|d_lane| <= |d_march|, i.e. rays
    within 45 degrees of the march axis — the same regime the window model
    assumes). The slab interval therefore splits into <= 3 segments whose
    voxels lie in {ra, rb} x {ca, cb} with rb = ra +- 1, cb = ca +- 1; one
    bf16-pair gather per window row serves both lane neighbors, and exact
    crossing parameters give exact per-voxel path lengths. ``K`` selects
    streaming mode (see ``_kernel``).
    """
    stream = K is not None
    chunk = pl.program_id(0) if stream else None
    s0, s1, s2 = s0[0], s1[0], s2[0]
    d0, d1, d2 = d0[0], d1[0], d2[0]
    ws = ws[0]

    if stream:
        @pl.when(chunk == 0)
        def _():
            out[0] = jnp.zeros((SUB, LANE), jnp.float32)

    safe_d0 = jnp.where(jnp.abs(d0) < 1e-6, 1e-6, d0)
    inv_d0 = 1.0 / safe_d0
    abs_d0 = jnp.abs(safe_d0)
    half = 0.5 * jnp.abs(inv_d0)
    safe_d1 = jnp.where(jnp.abs(d1) < 1e-9, 1e-9, d1)
    safe_d2 = jnp.where(jnp.abs(d2) < 1e-9, 1e-9, d2)

    a_in = jnp.zeros_like(s0)
    a_out = jnp.ones_like(s0)
    for s_i, d_i, n_i in ((s0, d0, M), (s1, d1, Wd), (s2, d2, L)):
        safe = jnp.where(jnp.abs(d_i) < 1e-9, 1e-9, d_i)
        t1 = (-0.5 - s_i) / safe
        t2 = (n_i - 0.5 - s_i) / safe
        lo_t = jnp.minimum(t1, t2)
        hi_t = jnp.maximum(t1, t2)
        parallel = jnp.abs(d_i) < 1e-9
        inside = (s_i > -0.5) & (s_i < n_i - 0.5)
        lo_t = jnp.where(parallel, jnp.where(inside, -3e38, 3e38), lo_t)
        hi_t = jnp.where(parallel, jnp.where(inside, 3e38, -3e38), hi_t)
        a_in = jnp.maximum(a_in, lo_t)
        a_out = jnp.minimum(a_out, hi_t)
    a_out = jnp.maximum(a_out, a_in)

    BIG = jnp.float32(3e38)

    def slab(k, acc):
        mf = ((chunk * K + k) if stream else k).astype(jnp.float32)
        alpha = (mf - s0) * inv_d0
        aa = jnp.maximum(alpha - half, a_in)
        ab = jnp.minimum(alpha + half, a_out)
        seg = ab - aa
        valid = (seg > 0.0) & (ws > 0.0)

        eps = 1e-5 * jnp.maximum(seg, 0.0)
        p1a = s1 + (aa + eps) * d1
        p1b = s1 + (ab - eps) * d1
        p2a = s2 + (aa + eps) * d2
        p2b = s2 + (ab - eps) * d2
        ra = jnp.clip(jnp.round(p1a).astype(jnp.int32), 0, Wd - 1)
        rb = jnp.clip(jnp.round(p1b).astype(jnp.int32), 0, Wd - 1)
        ca = jnp.clip(jnp.round(p2a).astype(jnp.int32), 0, L - 1)
        cb = jnp.clip(jnp.round(p2b).astype(jnp.int32), 0, L - 1)

        # crossing parameters (BIG = no crossing inside the slab)
        plane_w = (jnp.maximum(ra, rb).astype(jnp.float32) - 0.5)
        tw = jnp.where(ra != rb, (plane_w - s1) / safe_d1, BIG)
        plane_l = (jnp.maximum(ca, cb).astype(jnp.float32) - 0.5)
        tl = jnp.where(ca != cb, (plane_l - s2) / safe_d2, BIG)
        first_is_w = tw <= tl
        t1c = jnp.clip(jnp.minimum(tw, tl), aa, ab)
        t2c = jnp.clip(jnp.maximum(tw, tl), aa, ab)
        L1 = t1c - aa
        L2 = t2c - t1c
        L3 = ab - t2c
        L_ra_ca = L1
        L_rb_ca = jnp.where(first_is_w, L2, 0.0)
        L_ra_cb = jnp.where(first_is_w, 0.0, L2)
        L_rb_cb = L3

        # window base over the two candidate rows
        rmin = jnp.minimum(ra, rb)
        z0 = jnp.floor(jnp.min(jnp.where(valid, rmin.astype(jnp.float32), 3.4e38))).astype(jnp.int32)
        z0 = (z0 // 8) * 8
        z0 = jnp.clip(z0, 0, max(Wd - window, 0))

        cmin = jnp.clip(jnp.minimum(ca, cb), 0, L - 1)

        def compute(acc):
            base = (k * Wd + z0) * H
            win = table[pl.ds(base, window * H), :]
            contrib = jnp.zeros((SUB, LANE), jnp.float32)
            for d in range(window):
                zr = z0 + d
                g = _gather_halves(
                    lambda h: jnp.broadcast_to(win[d * H + h][None, :], (SUB, LANE)),
                    cmin, H,
                )
                lo, hi = _unpack(g)
                v_ca = jnp.where(ca == cmin, lo, hi)
                v_cb = jnp.where(cb == cmin, lo, hi)
                m_ra = valid & (ra == zr)
                m_rb = valid & (rb == zr)
                contrib = contrib + jnp.where(m_ra, L_ra_ca * v_ca + L_ra_cb * v_cb, 0.0)
                contrib = contrib + jnp.where(m_rb, L_rb_ca * v_ca + L_rb_cb * v_cb, 0.0)
            return acc + contrib

        return jax.lax.cond(jnp.any(valid), compute, lambda a: a, acc)

    zero = jnp.zeros((SUB, LANE), jnp.float32)
    acc = jax.lax.cond(
        jnp.any(ws > 0.0),
        lambda _: jax.lax.fori_loop(0, K if stream else M, slab, zero),
        lambda _: zero,
        None,
    )
    if stream:
        out[0] += acc * ws * abs_d0
    else:
        out[0] = acc * ws * abs_d0  # alpha-lengths * raylen


def _kernel_channels(s0, s1, s2, d0, d1, d2, ws, table, ltable, *outs,
                     M, Wd, H, L, window, channels):
    """Forward kernel with labelmap channel splitting.

    Each sample's trilinear contribution is attributed to the channel of the
    NEAREST voxel's label (matching the XLA renderer's nearest-label
    semantics): channel 0 = labels outside ``channels``, channel 1+k =
    ``channels[k]``. ``ltable`` holds int32 labels bitcast to f32 in the same
    packed row layout as ``table``.
    """
    C = len(channels) + 1
    s0, s1, s2 = s0[0], s1[0], s2[0]
    d0, d1, d2 = d0[0], d1[0], d2[0]
    ws = ws[0]

    safe_d0 = jnp.where(jnp.abs(d0) < 1e-6, 1e-6, d0)
    inv_d0 = 1.0 / safe_d0
    half = 0.5 * jnp.abs(inv_d0)

    a_in = jnp.zeros_like(s0)
    a_out = jnp.ones_like(s0)
    for s_i, d_i, n_i in ((s0, d0, M), (s1, d1, Wd), (s2, d2, L)):
        safe = jnp.where(jnp.abs(d_i) < 1e-9, 1e-9, d_i)
        t1 = (-0.5 - s_i) / safe
        t2 = (n_i - 0.5 - s_i) / safe
        lo_t = jnp.minimum(t1, t2)
        hi_t = jnp.maximum(t1, t2)
        parallel = jnp.abs(d_i) < 1e-9
        inside = (s_i > -0.5) & (s_i < n_i - 0.5)
        lo_t = jnp.where(parallel, jnp.where(inside, -3e38, 3e38), lo_t)
        hi_t = jnp.where(parallel, jnp.where(inside, 3e38, -3e38), hi_t)
        a_in = jnp.maximum(a_in, lo_t)
        a_out = jnp.minimum(a_out, hi_t)
    a_out = jnp.maximum(a_out, a_in)

    def slab(m, accs):
        mf = m.astype(jnp.float32)
        alpha = (mf - s0) * inv_d0
        p1 = s1 + alpha * d1
        p2 = s2 + alpha * d2
        w_alpha = jnp.maximum(
            jnp.minimum(alpha + half, a_out) - jnp.maximum(alpha - half, a_in), 0.0
        ) * jnp.abs(safe_d0)
        valid = w_alpha > 0.0
        valid &= (p1 > -1.0) & (p1 < Wd)
        valid &= (p2 >= 0.0) & (p2 <= L - 1.0)
        valid &= ws > 0.0

        p1_for_min = jnp.where(valid, p1, 3.4e38)
        z0 = jnp.floor(jnp.min(p1_for_min)).astype(jnp.int32)
        z0 = (z0 // 8) * 8
        z0 = jnp.clip(z0, 0, max(Wd - window, 0))

        idx = jnp.clip(p2.astype(jnp.int32), 0, L - 2 if L > 1 else 0)
        fx = jnp.clip(p2 - idx.astype(jnp.float32), 0.0, 1.0)
        # nearest-voxel indices for the label lookup (4 labels per f32 word)
        r_near = jnp.clip(jnp.round(p1).astype(jnp.int32), 0, Wd - 1)
        n_idx = jnp.clip(jnp.round(p2).astype(jnp.int32), 0, L - 1)
        n_word = n_idx >> 2
        n_shift = ((n_idx & 3) << 3).astype(jnp.uint32)

        def compute(accs):
            base = (m * Wd + z0) * H
            win = table[pl.ds(base, window * H), :]
            lwin = ltable[pl.ds(m * Wd + z0, window), :]

            contrib = jnp.zeros((SUB, LANE), jnp.float32)
            lab_bits = jnp.zeros((SUB, LANE), jnp.float32)
            for d in range(window):
                zr = z0 + d
                wz = jnp.maximum(1.0 - jnp.abs(p1 - zr.astype(jnp.float32)), 0.0)
                g = _gather_halves(
                    lambda h: jnp.broadcast_to(win[d * H + h][None, :], (SUB, LANE)),
                    idx, H,
                )
                lo, hi = _unpack(g)
                v = lo + fx * (hi - lo)
                w = jnp.where(valid & (zr < Wd), wz * w_alpha, 0.0)
                contrib = contrib + w * v

                near = valid & (r_near == zr)
                lrow = jnp.broadcast_to(lwin[d][None, :], (SUB, LANE))
                lg = jnp.take_along_axis(lrow, n_word, axis=1)
                lab_bits = jnp.where(near, lg, lab_bits)

            lab = ((pltpu.bitcast(lab_bits, jnp.uint32) >> n_shift) & jnp.uint32(0xFF)).astype(jnp.int32)
            new_accs = list(accs)
            is_fg = jnp.zeros((SUB, LANE), jnp.bool_)
            for k, lv in enumerate(channels):
                match = lab == lv
                is_fg = is_fg | match
                new_accs[k + 1] = accs[k + 1] + jnp.where(match, contrib, 0.0)
            new_accs[0] = accs[0] + jnp.where(is_fg, 0.0, contrib)
            return tuple(new_accs)

        return jax.lax.cond(jnp.any(valid), compute, lambda a: a, accs)

    init = tuple(jnp.zeros((SUB, LANE), jnp.float32) for _ in range(C))
    accs = jax.lax.cond(
        jnp.any(ws > 0.0),
        lambda _: jax.lax.fori_loop(0, M, slab, init),
        lambda _: init,
        None,
    )
    for k in range(C):
        outs[k][0] = accs[k] * ws


def pack_labels(mask: jnp.ndarray, perm: tuple[int, int, int]) -> jnp.ndarray:
    """Permute + pack an int labelmap, 4 uint8 labels per f32 word.

    Lane l of row (m * Wd + w) covers lane-axis voxels 4l..4l+3, so a single
    128-wide gather reaches L <= 512 and the table is 4x smaller than the
    density table (labels are clipped to 0..255)."""
    m = jnp.transpose(mask.astype(jnp.uint32), perm)
    m = jnp.clip(m, 0, 255)
    Mm, Wd, L = m.shape
    groups = -(-L // 4)
    if groups > LANE:
        raise ValueError(f"lane extent {L} > {4 * LANE} unsupported for labelmaps")
    pad = groups * 4 - L
    if pad:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, pad)))
    m = m.reshape(Mm, Wd, groups, 4)
    word = m[..., 0] | (m[..., 1] << 8) | (m[..., 2] << 16) | (m[..., 3] << 24)
    if groups < LANE:
        word = jnp.pad(word, ((0, 0), (0, 0), (0, LANE - groups)))
    bits = jax.lax.bitcast_convert_type(word, jnp.float32)
    return bits.reshape(Mm * Wd, LANE)


def _aabb_with_partials(s, d, n):
    """Per-axis AABB alphas and their partials w.r.t. (s_axis, d_axis).

    Returns (lo_t, hi_t, dlo_ds, dlo_dd, dhi_ds, dhi_dd) for one axis: the
    entry/exit candidates min(t1, t2)/max(t1, t2) for planes at -0.5, n-0.5,
    with subgradients through the active plane.
    """
    safe = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t1 = (-0.5 - s) / safe
    t2 = (n - 0.5 - s) / safe
    use1_lo = t1 <= t2
    lo_t = jnp.where(use1_lo, t1, t2)
    hi_t = jnp.where(use1_lo, t2, t1)
    inv = 1.0 / safe
    dlo_ds = -inv
    dhi_ds = -inv
    dlo_dd = -lo_t * inv
    dhi_dd = -hi_t * inv
    parallel = jnp.abs(d) < 1e-9
    inside = (s > -0.5) & (s < n - 0.5)
    lo_t = jnp.where(parallel, jnp.where(inside, -3e38, 3e38), lo_t)
    hi_t = jnp.where(parallel, jnp.where(inside, 3e38, -3e38), hi_t)
    zero = jnp.zeros_like(s)
    dlo_ds = jnp.where(parallel, zero, dlo_ds)
    dlo_dd = jnp.where(parallel, zero, dlo_dd)
    dhi_ds = jnp.where(parallel, zero, dhi_ds)
    dhi_dd = jnp.where(parallel, zero, dhi_dd)
    return lo_t, hi_t, dlo_ds, dlo_dd, dhi_ds, dhi_dd


def _kernel_bwd(s0, s1, s2, d0, d1, d2, ws, g, table,
                gs0, gs1, gs2, gd0, gd1, gd2, gws,
                *, M, Wd, H, L, window, K=None):
    """Analytic reverse pass: re-marches the volume and accumulates per-ray
    gradients w.r.t. the permuted source/direction components and the weight
    scale. Same memory pattern as the forward (volume resident in VMEM, or
    K-slab chunks streamed from HBM when K is set — see ``_kernel``), so the
    backward runs at ~2x the forward cost instead of paying XLA's scatter
    machinery."""
    stream = K is not None
    chunk = pl.program_id(0) if stream else None
    s0, s1, s2 = s0[0], s1[0], s2[0]
    d0, d1, d2 = d0[0], d1[0], d2[0]
    ws, g = ws[0], g[0]

    if stream:
        @pl.when(chunk == 0)
        def _():
            z = jnp.zeros((SUB, LANE), jnp.float32)
            for ref in (gs0, gs1, gs2, gd0, gd1, gd2, gws):
                ref[0] = z

    safe_d0 = jnp.where(jnp.abs(d0) < 1e-6, 1e-6, d0)
    inv_d0 = 1.0 / safe_d0
    abs_d0 = jnp.abs(safe_d0)
    sgn_d0 = jnp.sign(safe_d0)
    half = 0.5 / abs_d0
    dh_dd0 = -sgn_d0 * 2.0 * half * half  # d(1/(2|d0|))/d d0

    # AABB with partials; track the active axis/side for a_in and a_out
    zero = jnp.zeros_like(s0)
    a_in, a_out = jnp.zeros_like(s0), jnp.ones_like(s0)
    # partials of a_in/a_out wrt the 6 inputs (only active axis contributes)
    dain = [zero] * 6  # order: s0 s1 s2 d0 d1 d2
    daout = [zero] * 6
    axes = ((s0, d0, M, 0, 3), (s1, d1, Wd, 1, 4), (s2, d2, L, 2, 5))
    for s_i, d_i, n_i, si_idx, di_idx in axes:
        lo_t, hi_t, dls, dld, dhs, dhd = _aabb_with_partials(s_i, d_i, n_i)
        take_lo = lo_t > a_in
        a_in = jnp.maximum(a_in, lo_t)
        dain = [jnp.where(take_lo, zero, gprev) for gprev in dain]
        dain[si_idx] = jnp.where(take_lo, dls, dain[si_idx])
        dain[di_idx] = jnp.where(take_lo, dld, dain[di_idx])
        take_hi = hi_t < a_out
        a_out = jnp.minimum(a_out, hi_t)
        daout = [jnp.where(take_hi, zero, gprev) for gprev in daout]
        daout[si_idx] = jnp.where(take_hi, dhs, daout[si_idx])
        daout[di_idx] = jnp.where(take_hi, dhd, daout[di_idx])
    clip_out = a_out < a_in
    a_out = jnp.maximum(a_out, a_in)
    daout = [jnp.where(clip_out, gi, go) for gi, go in zip(dain, daout)]

    def slab(k, carry):
        acc, g0, g1_, g2_, g3_, g4_, g5_ = carry
        mf = ((chunk * K + k) if stream else k).astype(jnp.float32)
        alpha = (mf - s0) * inv_d0
        da_ds0 = -inv_d0
        da_dd0 = -alpha * inv_d0
        p1 = s1 + alpha * d1
        p2 = s2 + alpha * d2

        u_arg = alpha + half
        v_arg = alpha - half
        u = jnp.minimum(u_arg, a_out)
        v = jnp.maximum(v_arg, a_in)
        span = jnp.maximum(u - v, 0.0)
        W = span * abs_d0
        open_ = span > 0.0
        u_int = u_arg < a_out
        v_int = v_arg > a_in

        valid = open_
        valid &= (p1 > -1.0) & (p1 < Wd)
        valid &= (p2 >= 0.0) & (p2 <= L - 1.0)
        valid &= ws > 0.0

        p1_for_min = jnp.where(valid, p1, 3.4e38)
        z0 = jnp.floor(jnp.min(p1_for_min)).astype(jnp.int32)
        z0 = jnp.clip(z0, 0, max(Wd - window, 0))

        idx = jnp.clip(p2.astype(jnp.int32), 0, L - 2 if L > 1 else 0)
        fx = jnp.clip(p2 - idx.astype(jnp.float32), 0.0, 1.0)

        def accumulate_B(_):
            B = jnp.zeros_like(s0)
            dB_dp1 = jnp.zeros_like(s0)
            dB_dp2 = jnp.zeros_like(s0)
            base = (k * Wd + z0) * H
            win = table[pl.ds(base, window * H), :]
            for dwin in range(window):
                zr = z0 + dwin
                diff = p1 - zr.astype(jnp.float32)
                inside_row = (jnp.abs(diff) < 1.0) & valid
                wz = jnp.maximum(1.0 - jnp.abs(diff), 0.0)
                dtri = -jnp.sign(diff)
                gat = _gather_halves(
                    lambda h: jnp.broadcast_to(win[dwin * H + h][None, :], (SUB, LANE)),
                    idx, H,
                )
                lo, hi = _unpack(gat)
                val = lo + fx * (hi - lo)
                mask = inside_row.astype(jnp.float32)
                B += mask * wz * val
                dB_dp1 += mask * dtri * val
                dB_dp2 += mask * wz * (hi - lo)
            return B, dB_dp1, dB_dp2

        zeros3 = (jnp.zeros_like(s0),) * 3
        B, dB_dp1, dB_dp2 = jax.lax.cond(
            jnp.any(valid), accumulate_B, lambda _: zeros3, None
        )

        gc = g * ws  # upstream for acc contributions
        validf = valid.astype(jnp.float32)

        # dW/dθ = |d0| dspan + span d|d0|; dspan = [open](du - dv)
        def dspan(d_alpha, d_h, d_ain, d_aout):
            du = jnp.where(u_int, d_alpha + d_h, d_aout)
            dv = jnp.where(v_int, d_alpha - d_h, d_ain)
            return jnp.where(open_, du - dv, 0.0)

        # per-θ: (d_alpha, d_h, dp1, dp2, extra dW term)
        # s0
        dW = abs_d0 * dspan(da_ds0, zero, dain[0], daout[0])
        g0 += gc * validf * (dW * B + W * (dB_dp1 * d1 * da_ds0 + dB_dp2 * d2 * da_ds0))
        # s1
        dW = abs_d0 * dspan(zero, zero, dain[1], daout[1])
        g1_ += gc * validf * (dW * B + W * dB_dp1)
        # s2
        dW = abs_d0 * dspan(zero, zero, dain[2], daout[2])
        g2_ += gc * validf * (dW * B + W * dB_dp2)
        # d0
        dW = abs_d0 * dspan(da_dd0, dh_dd0, dain[3], daout[3]) + span * sgn_d0
        g3_ += gc * validf * (dW * B + W * (dB_dp1 * d1 * da_dd0 + dB_dp2 * d2 * da_dd0))
        # d1
        dW = abs_d0 * dspan(zero, zero, dain[4], daout[4])
        g4_ += gc * validf * (dW * B + W * dB_dp1 * alpha)
        # d2
        dW = abs_d0 * dspan(zero, zero, dain[5], daout[5])
        g5_ += gc * validf * (dW * B + W * dB_dp2 * alpha)

        acc += jnp.where(valid, W * B, 0.0)
        return (acc, g0, g1_, g2_, g3_, g4_, g5_)

    init = tuple(jnp.zeros((SUB, LANE), jnp.float32) for _ in range(7))
    acc, g0, g1_, g2_, g3_, g4_, g5_ = jax.lax.cond(
        jnp.any(ws > 0.0),
        lambda _: jax.lax.fori_loop(0, K if stream else M, slab, init),
        lambda _: init,
        None,
    )
    if stream:
        gs0[0] += g0
        gs1[0] += g1_
        gs2[0] += g2_
        gd0[0] += g3_
        gd1[0] += g4_
        gd2[0] += g5_
        gws[0] += g * acc
    else:
        gs0[0] = g0
        gs1[0] = g1_
        gs2[0] = g2_
        gd0[0] = g3_
        gd1[0] = g4_
        gd2[0] = g5_
        gws[0] = g * acc


STREAM_THRESHOLD = 100 * 1024 * 1024  # table bytes above which we stream


def _stream_chunk(vol_shape: tuple[int, int, int]) -> int:
    """Slabs per streamed chunk: targets a ~6 MB table block (fits VMEM
    double-buffered alongside ray tiles with plenty of headroom)."""
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    per_slab = Wd * H * LANE * 4
    return max(1, min(int(M), (6 * 1024 * 1024) // per_slab))


def _pad_to(x, m, axis):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, pad)
    return jnp.pad(x, pads)


def _prep_fields(s_vox, d_vox, wscale, det_shape):
    Hd, Wdet = det_shape

    def prep(x):
        x = x.reshape(x.shape[0], Hd, Wdet)
        return _pad_to(_pad_to(x, SUB, 1), LANE, 2)

    fields = [prep(s_vox[..., k]) for k in range(3)]
    fields += [prep(d_vox[..., k]) for k in range(3)]
    fields.append(prep(wscale))
    return fields


def _specs(B, Hp, Wp, table_shape, n_rays_io, n_outs):
    ray_spec = pl.BlockSpec(
        (1, SUB, LANE), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(table_shape, lambda b, i, j: (0, 0), memory_space=pltpu.VMEM)
    grid = (B, Hp // SUB, Wp // LANE)
    in_specs = [ray_spec] * n_rays_io + [tab_spec]
    out_specs = ray_spec if n_outs == 1 else [ray_spec] * n_outs
    out_shape = jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)
    if n_outs > 1:
        out_shape = [out_shape] * n_outs
    return grid, in_specs, out_specs, out_shape


def _stream_setup(packed_table, vol_shape, B, Hp, Wp, n_rays_io, n_outs):
    """Grid/specs for streaming mode: chunk dim OUTERMOST so the table block
    (indexed by chunk only) crosses HBM->VMEM once per render while the ray
    and output tiles revisit per chunk."""
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    K = _stream_chunk(vol_shape)
    chunk_rows = K * Wd * H
    pad_rows = (-packed_table.shape[0]) % chunk_rows
    if pad_rows:
        packed_table = jnp.pad(packed_table, ((0, pad_rows), (0, 0)))
    n_chunks = packed_table.shape[0] // chunk_rows
    ray_spec = pl.BlockSpec(
        (1, SUB, LANE), lambda c, b, i, j: (b, i, j), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (chunk_rows, LANE), lambda c, b, i, j: (c, 0), memory_space=pltpu.VMEM
    )
    grid = (n_chunks, B, Hp // SUB, Wp // LANE)
    in_specs = [ray_spec] * n_rays_io + [tab_spec]
    out_specs = ray_spec if n_outs == 1 else [ray_spec] * n_outs
    out_shape = jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)
    if n_outs > 1:
        out_shape = [out_shape] * n_outs
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * 4,
        vmem_limit_bytes=110 * 1024 * 1024,
    )
    return packed_table, K, grid, in_specs, out_specs, out_shape, params


def _core_impl(packed_table, s_vox, d_vox, wscale, cfg):
    det_shape, vol_shape, window, interpret, stream = cfg
    Hd, Wdet = det_shape
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    B = s_vox.shape[0]
    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE
    fields = _prep_fields(s_vox, d_vox, wscale, det_shape)
    if stream:
        packed_table, K, grid, in_specs, out_specs, out_shape, params = _stream_setup(
            packed_table, vol_shape, B, Hp, Wp, 7, 1
        )
    else:
        K = None
        grid, in_specs, out_specs, out_shape = _specs(B, Hp, Wp, packed_table.shape, 7, 1)
        params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    out = pl.pallas_call(
        partial(_kernel, M=M, Wd=Wd, H=H, L=L, window=window, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=interpret,
    )(*fields, packed_table)
    return out[:, :Hd, :Wdet].reshape(B, Hd * Wdet)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _core(packed_table, s_vox, d_vox, wscale, cfg):
    return _core_impl(packed_table, s_vox, d_vox, wscale, cfg)


def _core_fwd(packed_table, s_vox, d_vox, wscale, cfg):
    out = _core_impl(packed_table, s_vox, d_vox, wscale, cfg)
    return out, (packed_table, s_vox, d_vox, wscale)


def _core_bwd(cfg, res, g):
    packed_table, s_vox, d_vox, wscale = res
    det_shape, vol_shape, window, interpret, stream = cfg
    Hd, Wdet = det_shape
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    B = s_vox.shape[0]
    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE
    fields = _prep_fields(s_vox, d_vox, wscale, det_shape)
    gp = _pad_to(_pad_to(g.reshape(B, Hd, Wdet), SUB, 1), LANE, 2)
    if stream:
        packed_table, K, grid, in_specs, out_specs, out_shape, params = _stream_setup(
            packed_table, vol_shape, B, Hp, Wp, 8, 7
        )
    else:
        K = None
        grid, in_specs, out_specs, out_shape = _specs(B, Hp, Wp, packed_table.shape, 8, 7)
        params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    outs = pl.pallas_call(
        partial(_kernel_bwd, M=M, Wd=Wd, H=H, L=L, window=window, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=interpret,
    )(*fields, gp, packed_table)

    def unpad(x):
        return x[:, :Hd, :Wdet].reshape(B, Hd * Wdet)

    g_s = jnp.stack([unpad(outs[k]) for k in range(3)], axis=-1)
    g_d = jnp.stack([unpad(outs[k]) for k in range(3, 6)], axis=-1)
    g_ws = unpad(outs[6])
    # volume gradients are not propagated (the CT is data, as in the
    # reference); the zero cotangent is DCE'd when unused
    return jnp.zeros_like(packed_table), g_s, g_d, g_ws


_core.defvjp(_core_fwd, _core_bwd)


def _channels_impl(packed_table, label_table, s_vox, d_vox, wscale, cfg):
    det_shape, vol_shape, window, interpret, channels = cfg
    Hd, Wdet = det_shape
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    B = s_vox.shape[0]
    C = len(channels) + 1
    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE
    fields = _prep_fields(s_vox, d_vox, wscale, det_shape)
    ray_spec = pl.BlockSpec((1, SUB, LANE), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(packed_table.shape, lambda b, i, j: (0, 0), memory_space=pltpu.VMEM)
    ltab_spec = pl.BlockSpec(label_table.shape, lambda b, i, j: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        partial(_kernel_channels, M=M, Wd=Wd, H=H, L=L, window=window, channels=channels),
        grid=(B, Hp // SUB, Wp // LANE),
        in_specs=[ray_spec] * 7 + [tab_spec, ltab_spec],
        out_specs=[ray_spec] * C,
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)] * C,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*fields, packed_table, label_table)
    out = jnp.stack([o[:, :Hd, :Wdet] for o in outs], axis=1)
    return out.reshape(B, C, Hd * Wdet)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _channels_core(packed_table, label_table, s_vox, d_vox, wscale, cfg):
    return _channels_impl(packed_table, label_table, s_vox, d_vox, wscale, cfg)


def _channels_fwd(packed_table, label_table, s_vox, d_vox, wscale, cfg):
    out = _channels_impl(packed_table, label_table, s_vox, d_vox, wscale, cfg)
    return out, (packed_table, label_table, s_vox, d_vox, wscale)


def _channels_bwd(cfg, res, g):
    """Backward through the plain (summed) kernel.

    Exact whenever downstream consumes channels only through their SUM and/or
    non-differentiable indicators (the training loss does: the summed image
    feeds mNCC, the per-channel masks only thresholded Dice). Then every
    channel's cotangent equals the sum-image cotangent g*, and the correct
    pullback sum_k g_k * d(out_k)/dtheta collapses to g* * d(plain)/dtheta —
    i.e. the plain backward applied to the (mean) cotangent. Per-channel
    gradient attribution is intentionally not modeled.
    """
    packed_table, label_table, s_vox, d_vox, wscale = res
    det_shape, vol_shape, window, interpret, channels = cfg
    g_eff = jnp.mean(g, axis=1)
    _, g_s, g_d, g_ws = _core_bwd(
        (det_shape, vol_shape, window, interpret, False),
        (packed_table, s_vox, d_vox, wscale),
        g_eff,
    )
    return jnp.zeros_like(packed_table), jnp.zeros_like(label_table), g_s, g_d, g_ws


_channels_core.defvjp(_channels_fwd, _channels_bwd)


@partial(
    jax.jit,
    static_argnames=("det_shape", "vol_shape", "window", "perm", "interpret", "channels"),
)
def _render_channels(
    packed_table, label_table, s_vox, d_vox, wscale,
    *, det_shape, vol_shape, window, perm, interpret, channels,
):
    return _channels_core(
        packed_table, label_table, s_vox, d_vox, wscale,
        (det_shape, vol_shape, window, interpret, channels),
    )


@partial(
    jax.jit,
    static_argnames=("det_shape", "vol_shape", "window", "perm", "interpret", "stream"),
)
def _render(
    packed_table,
    s_vox,
    d_vox,
    wscale,
    *,
    det_shape,
    vol_shape,
    window,
    perm,
    interpret,
    stream=False,
):
    return _core(
        packed_table, s_vox, d_vox, wscale,
        (det_shape, vol_shape, window, interpret, stream),
    )


def _choose_permutation(
    d_mean: np.ndarray, u_dir: np.ndarray | None = None
) -> tuple[int, int, int]:
    """March axis = dominant mean ray direction.

    Of the two transverse axes, the one most aligned with the detector
    COLUMN direction (``u_dir``) must be the LANE axis: the 128-wide lane
    gather handles arbitrary per-ray variation for free, while the WINDOW
    axis pays linearly for its per-tile span. Detector columns are the long
    (128-lane) tile dimension, so putting their image on lanes keeps the
    window small (usually just the 8-row spread plus in-plane roll).
    """
    march = int(np.argmax(np.abs(d_mean)))
    rest = [a for a in range(3) if a != march]
    if u_dir is not None:
        lane = rest[int(np.argmax([abs(u_dir[a]) for a in rest]))]
    else:
        lane = rest[1]
    win = rest[0] if lane == rest[1] else rest[1]
    return march, win, lane


def choose_permutation_for_pose(pose_R: np.ndarray, affine_inverse: np.ndarray) -> tuple[int, int, int]:
    """Static permutation from a representative pose (host-side, pre-jit):
    the beam direction -y_cam picks the march axis; the detector column
    direction +x_cam picks the lane axis (see _choose_permutation)."""
    A = np.asarray(affine_inverse)[:3, :3]
    R = np.asarray(pose_R)
    beam_vox = A @ (R @ np.asarray([0.0, -1.0, 0.0]))
    u_vox = A @ (R @ np.asarray([1.0, 0.0, 0.0]))
    return _choose_permutation(beam_vox, u_vox)


def _remap_key(s0, s1, d0, d1, M, xp=jnp):
    """Sort key for ray remapping: the window coordinate at the mid-march
    plane. Grouping rays by this key (instead of detector adjacency) shrinks
    the per-tile window span ~3x under in-plane roll/skew; the kernel is
    layout-agnostic, so only the wrapper reorders."""
    safe_d0 = xp.where(xp.abs(d0) < 1e-6, 1e-6, d0)
    alpha = (0.5 * (M - 1) - s0) / safe_d0
    return s1 + alpha * d1


def measured_window_span(
    source: np.ndarray,
    target: np.ndarray,
    affine_inverse: np.ndarray,
    perm: tuple[int, int, int],
    det_shape: tuple[int, int],
    vol_shape: tuple[int, int, int],
    n_probe_slabs: int = 9,
    remap: bool = False,
) -> float:
    """EXACT per-tile window-coordinate span (voxels) for given rays.

    Host-side NumPy: evaluates the window coordinate of every VALID ray (one
    whose in-volume segment covers the probe slab) at probe march planes and
    takes the worst tile max - tile min. Use to size (or validate) the static
    ``window`` — a window smaller than this silently clips contributions.
    ``vol_shape`` is the PERMUTED volume shape (march, window, lane), i.e.
    ``pack_density(...)[1]``.
    """
    Hd, Wdet = det_shape
    M, Wd, L = vol_shape
    A = np.asarray(affine_inverse)
    s = np.asarray(source) @ A[:3, :3].T + A[:3, 3]
    t = np.asarray(target) @ A[:3, :3].T + A[:3, 3]
    s = np.broadcast_to(s, t.shape)
    d = t - s
    march, win, lane = perm
    s0, s1, s2 = s[..., march], s[..., win], s[..., lane]
    d0, d1, d2 = d[..., march], d[..., win], d[..., lane]
    safe_d0 = np.where(np.abs(d0) < 1e-6, 1e-6, d0)

    B = t.shape[0]
    shift = None
    if remap:
        # replicate the render-time shear exactly (f32 arithmetic; residual
        # rounding differences are covered by the +2 margin)
        shift = _shear_shift(
            s0.reshape(B, -1).astype(np.float32),
            s1.reshape(B, -1).astype(np.float32),
            d0.reshape(B, -1).astype(np.float32),
            d1.reshape(B, -1).astype(np.float32),
            M, det_shape, xp=np,
        )
        shift = np.clip(shift, 0, _shear_pad(det_shape))

    span = 0.0
    # probe march planes spanning the volume's march extent
    m_lo = max(float(np.minimum(s0, s0 + d0).min()), 0.0)
    m_hi = min(float(np.maximum(s0, s0 + d0).max()), float(M - 1))
    for m in np.linspace(m_lo, m_hi, n_probe_slabs):
        alpha = (m - s0) / safe_d0
        p1 = s1 + alpha * d1
        p2 = s2 + alpha * d2
        # the kernel only windows rays it treats as valid at this slab
        valid = (alpha >= 0.0) & (alpha <= 1.0)
        valid &= (p1 > -1.0) & (p1 < Wd) & (p2 >= 0.0) & (p2 <= L - 1.0)
        p1_lo = np.where(valid, p1, np.inf).reshape(B, Hd, Wdet)
        p1_hi = np.where(valid, p1, -np.inf).reshape(B, Hd, Wdet)
        if shift is not None:
            pad = _shear_pad(det_shape)
            Hp = Hd + pad
            r = np.arange(Hd)[:, None] + shift[:, None, :]  # (B, Hd, Wdet)
            c = np.broadcast_to(np.arange(Wdet), (B, Hd, Wdet))
            b_ix = np.arange(B)[:, None, None]
            lo_img = np.full((B, Hp, Wdet), np.inf)
            hi_img = np.full((B, Hp, Wdet), -np.inf)
            lo_img[b_ix, r, c] = p1_lo
            hi_img[b_ix, r, c] = p1_hi
            p1_lo, p1_hi, rows = lo_img, hi_img, Hp
        else:
            rows = Hd
        # tile reduction: 8-row x 128-col tiles (the kernel's grid)
        for i0 in range(0, rows, SUB):
            for j0 in range(0, Wdet, LANE):
                lo = np.min(p1_lo[:, i0 : i0 + SUB, j0 : j0 + LANE], axis=(1, 2))
                hi = np.max(p1_hi[:, i0 : i0 + SUB, j0 : j0 + LANE], axis=(1, 2))
                tile_span = float(np.max(hi - lo))  # -inf when tile all-invalid
                if np.isfinite(tile_span):
                    span = max(span, tile_span)
    return span + 2.0  # + interpolation margin


def measured_steepness(
    source: np.ndarray,
    target: np.ndarray,
    affine_inverse: np.ndarray,
    perm: tuple[int, int, int],
) -> float:
    """max over rays of max(|d_win|, |d_lane|) / |d_march|.

    The slab-marching kernels assume rays stay within ~45 degrees of the
    march axis (steepness <= ~1): beyond that the trilinear kernel
    undersamples (one sample per march plane) and the Siddon kernel's
    <=1-crossing-per-slab invariant breaks. Callers should fall back to the
    XLA renderer when this exceeds ~1.2.
    """
    A = np.asarray(affine_inverse)
    s = np.asarray(source) @ A[:3, :3].T + A[:3, 3]
    t = np.asarray(target) @ A[:3, :3].T + A[:3, 3]
    d = t - np.broadcast_to(s, t.shape)
    march, win, lane = perm
    d0 = np.maximum(np.abs(d[..., march]), 1e-9)
    trans = np.maximum(np.abs(d[..., win]), np.abs(d[..., lane]))
    return float((trans / d0).max())


def estimate_window_span(d_vox: np.ndarray, perm, det_shape) -> float:
    """Estimated per-tile window-coordinate span (voxels) — used to pick the
    static window size or fall back to the XLA renderer."""
    Hd, Wdet = det_shape
    march, win, lane = perm
    d = np.asarray(d_vox).reshape(-1, Hd, Wdet, 3)
    # window coord drift per detector pixel, at ray midpoints
    dwin = d[..., win] / np.maximum(np.abs(d[..., march]), 1e-6)
    # span across a tile ~ |d(dwin)/drow| * 8 + |d(dwin)/dcol| * 128, bounded
    # by finite differences across the detector
    row_d = np.abs(np.diff(dwin, axis=1)).max(initial=0.0)
    col_d = np.abs(np.diff(dwin, axis=2)).max(initial=0.0)
    # crossing the volume takes <= M slabs; each slab advances the ray by
    # ~1/|d_march| in alpha. The transverse divergence between neighboring
    # rays accumulated over the whole volume is the tile span driver.
    return float(row_d * SUB + col_d * LANE) * 1.2 + 4.0


def packed_table_bytes(vol_shape_or_density, perm=None) -> int:
    """Size of the bf16-pair packed density table.

    The VMEM-resident kernels need this to fit (with ray tiles and headroom)
    in the ~128 MB of v5e VMEM; callers should fall back to the XLA renderer
    above ~100 MB (e.g. full-resolution 512^3 CTs)."""
    shape = getattr(vol_shape_or_density, "shape", vol_shape_or_density)
    if perm is not None:
        shape = [shape[a] for a in perm]
    M, Wd, L = (int(x) for x in shape)
    H = -(-L // LANE)
    return M * Wd * H * LANE * 4


def _shear_pad(det_shape: tuple[int, int]) -> int:
    """Static row padding for the shear remap: covers per-column shifts up to
    Wdet/2 (in-plane roll ~26 deg). Larger shifts are clipped — the window
    measurement replicates the clipping, so a too-small pad only costs window
    size, never correctness. The padded rows cost little: their tiles have no
    valid rays, so every slab takes the kernel's skip branch."""
    return -(-(det_shape[1] // 2) // SUB) * SUB


def _shift_from_key(key, det_shape, xp=jnp):
    """Per-column row shift (B, Wdet) flattening an ~affine window coordinate.

    ``key ~ g_r*row + g_c*col`` over the detector grid; placing ray (r, c) at
    row r + round(g_c/g_r * c) cancels the column term, so an 8x128 tile's
    span drops from |g_r|*8 + |g_c|*128 to ~|g_r|*9. Slopes are
    median-estimated on a coarse subgrid (robust to edge rays with degenerate
    direction). Shared by the slab kernel's ray remap and the shear-warp
    warp's barrel shift (xvr_tpu/render/shearwarp.py)."""
    Hd, Wdet = det_shape
    B = key.shape[0]
    key = key.reshape(B, Hd, Wdet)
    sub = key[:, ::4, ::4]
    g_r = xp.median((sub[:, 1:] - sub[:, :-1]).reshape(B, -1), axis=1) / 4.0
    g_c = xp.median((sub[:, :, 1:] - sub[:, :, :-1]).reshape(B, -1), axis=1) / 4.0
    safe = xp.where(xp.abs(g_r) < 1e-9, 1e-9, g_r)
    ratio = g_c / safe
    cols = xp.arange(Wdet, dtype=key.dtype)
    shift = xp.round(ratio[:, None] * cols[None, :])
    shift = shift - shift.min(axis=1, keepdims=True)
    return shift.astype(xp.int32)


def _shear_shift(s0, s1, d0, d1, M, det_shape, xp=jnp):
    """Per-column row shift for the slab kernel's mid-march window key."""
    key = _remap_key(s0, s1, d0, d1, M, xp=xp)
    return _shift_from_key(key, det_shape, xp=xp)


def _barrel_shear(x, shift, pad, Hd, reverse=False):
    """Shift each column's rows down by ``shift`` (clipped to ``pad``) via a
    log-step barrel shifter: O(log pad) rolls + selects, no sorts/gathers
    (XLA sort/gather cost ~50 ms per 1M rays on v5e; this costs ~1 ms).

    Forward: (B, Hd, W[, k]) -> (B, Hd+pad, W[, k]) with zero fill (zero
    wscale marks the empty slots invalid). Reverse: crops back to Hd rows."""
    sh = jnp.clip(shift, 0, pad)
    if not reverse:
        pads = [(0, 0), (0, pad), (0, 0)] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pads)
    mask_shape = (x.shape[0], 1, x.shape[2]) + (1,) * (x.ndim - 3)
    for bit in range(max(int(pad).bit_length(), 1)):
        amt = 1 << bit
        rolled = jnp.roll(x, -amt if reverse else amt, axis=1)
        m = (((sh >> bit) & 1) > 0).reshape(mask_shape)
        x = jnp.where(m, rolled, x)
    return x[:, :Hd] if reverse else x


def _shear_layout(s_p, d_p, wscale, M, det_shape, pad):
    """Apply the shear remap to the ray fields.

    Returns sheared fields (flattened back to (B, R')), the per-column shift
    for the inverse transform, and the enlarged detector shape."""
    Hd, Wdet = det_shape
    B = wscale.shape[0]
    shift = _shear_shift(
        s_p[..., 0], s_p[..., 1], d_p[..., 0], d_p[..., 1], M, det_shape
    )

    def go(x):
        img = x.reshape((B, Hd, Wdet) + x.shape[2:])
        out = _barrel_shear(img, shift, pad, Hd)
        return out.reshape((B, (Hd + pad) * Wdet) + x.shape[2:])

    return go(s_p), go(d_p), go(wscale), shift, (Hd + pad, Wdet)


def raymarch_trilinear_pallas(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    n_samples: int | None = None,  # unused: sampling = slab crossings
    mask=None,
    labels=None,
    det_shape: tuple[int, int] | None = None,
    window: int = 32,
    interpret: bool | None = None,
    perm: tuple[int, int, int] | None = None,
    packed=None,  # optional (packed_table, vol_shape) from pack_density
    remap: bool = False,
    stream: bool | None = None,
) -> jnp.ndarray:
    """Drop-in for :func:`xvr_tpu.render.xla.raymarch_trilinear`.

    ``source``/``target``: (B, 1|R, 3) world mm; returns (B, R), or (B, C, R)
    when a labelmap + labels are given (channel 0 = background; nearest-voxel
    label attribution, like the XLA renderer). ``stream`` (default: auto by
    table size) streams the volume from HBM in slab chunks — required for
    volumes whose packed table exceeds VMEM (e.g. full-resolution 512^3 CTs);
    the channel path has no streaming mode and falls back to the XLA renderer.
    """
    use_channels = mask is not None and labels is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, R = target.shape[0], target.shape[1]
    if det_shape is None:
        side = int(round(np.sqrt(R)))
        if side * side != R:
            raise ValueError("det_shape required for non-square ray grids")
        det_shape = (side, side)

    A = affine_inverse
    s_vox = jnp.matmul(source, A[:3, :3].T, precision="highest") + A[:3, 3]
    t_vox = jnp.matmul(target, A[:3, :3].T, precision="highest") + A[:3, 3]
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d_vox = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)

    if perm is None:
        # data-dependent metadata: host probe (blocks; pass perm explicitly to
        # stay jit-traceable, e.g. from choose_permutation_for_pose)
        d_mean = np.asarray(jax.device_get(jnp.mean(d_vox, axis=(0, 1))))
        perm = _choose_permutation(d_mean)
    march, win, lane = perm

    if packed is None:
        packed, vol_shape = pack_density(density, perm)
    else:
        packed, vol_shape = packed

    s_p = jnp.stack([s_vox[..., march], s_vox[..., win], s_vox[..., lane]], axis=-1)
    d_p = jnp.stack([d_vox[..., march], d_vox[..., win], d_vox[..., lane]], axis=-1)
    wscale = raylen / jnp.clip(jnp.abs(d_p[..., 0]), 1e-6)

    # a window >= the transverse extent can never clip; cap the cost there
    window = min(int(window), int(vol_shape[1]))
    if stream is None:
        stream = packed_table_bytes(vol_shape) > STREAM_THRESHOLD
    Hd0, Wd0 = det_shape
    pad = _shear_pad(det_shape) if remap else 0
    if use_channels and stream:
        from . import xla

        return xla.raymarch_trilinear(
            density, affine_inverse, source, target,
            n_samples=n_samples, mask=mask, labels=labels,
        )
    if use_channels:
        label_table = pack_labels(mask, perm)
        if remap:
            s_p, d_p, wscale, shift, det_shape = _shear_layout(
                s_p, d_p, wscale, vol_shape[0], det_shape, pad
            )
        out = _render_channels(
            packed, label_table, s_p, d_p, wscale,
            det_shape=det_shape,
            vol_shape=vol_shape,
            window=window,
            perm=perm,
            interpret=bool(interpret),
            channels=tuple(int(x) for x in labels),
        )
        if remap:
            C = out.shape[1]
            img = out.reshape(B, C, Hd0 + pad, Wd0).transpose(0, 2, 3, 1)
            img = _barrel_shear(img, shift, pad, Hd0, reverse=True)
            out = img.transpose(0, 3, 1, 2).reshape(B, C, Hd0 * Wd0)
        return out
    if remap:
        s_p, d_p, wscale, shift, det_shape = _shear_layout(
            s_p, d_p, wscale, vol_shape[0], det_shape, pad
        )
    out = _render(
        packed, s_p, d_p, wscale,
        det_shape=det_shape,
        vol_shape=vol_shape,
        window=window,
        perm=perm,
        interpret=bool(interpret),
        stream=bool(stream),
    )
    if remap:
        img = _barrel_shear(out.reshape(B, Hd0 + pad, Wd0), shift, pad, Hd0, reverse=True)
        out = img.reshape(B, Hd0 * Wd0)
    return out


def pack_density(density: jnp.ndarray, perm: tuple[int, int, int]):
    """Permute + bf16-pair-pack a density grid for the kernel.

    O(volume) work — hoist it out of optimization loops (the registrar packs
    once per stage; the trainer once per step) and pass the result via the
    ``packed`` argument of :func:`raymarch_trilinear_pallas`.
    """
    vol_perm = jnp.transpose(density, perm)
    return _pack_pairs(vol_perm), tuple(vol_perm.shape)


@partial(
    jax.jit,
    static_argnames=("det_shape", "vol_shape", "window", "perm", "interpret", "stream"),
)
def _render_siddon(
    packed_table, s_vox, d_vox, wscale,
    *, det_shape, vol_shape, window, perm, interpret, stream=False,
):
    det = det_shape
    Hd, Wdet = det
    M, Wd, L = vol_shape
    H = -(-L // LANE)
    B = s_vox.shape[0]
    Hp, Wp = -(-Hd // SUB) * SUB, -(-Wdet // LANE) * LANE
    fields = _prep_fields(s_vox, d_vox, wscale, det_shape)
    if stream:
        packed_table, K, grid, in_specs, out_specs, out_shape, params = _stream_setup(
            packed_table, vol_shape, B, Hp, Wp, 7, 1
        )
    else:
        K = None
        grid, in_specs, out_specs, out_shape = _specs(B, Hp, Wp, packed_table.shape, 7, 1)
        params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    out = pl.pallas_call(
        partial(_kernel_siddon, M=M, Wd=Wd, H=H, L=L, window=window, K=K),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=params,
        interpret=interpret,
    )(*fields, packed_table)
    return out[:, :Hd, :Wdet].reshape(B, Hd * Wdet)


def raymarch_siddon_pallas(
    density: jnp.ndarray,
    affine_inverse: jnp.ndarray,
    source: jnp.ndarray,
    target: jnp.ndarray,
    mask=None,
    labels=None,
    det_shape: tuple[int, int] | None = None,
    window: int = 32,
    interpret: bool | None = None,
    perm: tuple[int, int, int] | None = None,
    packed=None,
    remap: bool = False,
    stream: bool | None = None,
) -> jnp.ndarray:
    """Exact Siddon kernel — CROSS-CHECK ONLY, not a production path.

    Forward only (no pose gradients; the XLA DDA remains the differentiable
    exact reference) at ~99 DRRs/s. Production ``--renderer siddon`` runs
    the differentiable siddon-flavored shear-warp path instead
    (``raymarch_siddon_shearwarp``, ~5,500 DRRs/s, eps=0.25 trapezoid
    profile); tests/test_registrar.py::test_siddon_fast_registration_accuracy
    bounds what that smoothing does to registration accuracy (equal or
    better mTRE at matched budget). This kernel survives as the golden
    forward for bit-level Siddon semantics: exact within the bf16 volume
    quantization while rays stay within ~45 degrees of the march axis.
    Labelmap channel rendering falls back to the XLA path."""
    if mask is not None and labels is not None:
        from . import xla

        return xla.raymarch_siddon(
            density, affine_inverse, source, target, mask=mask, labels=labels
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    B, R = target.shape[0], target.shape[1]
    if det_shape is None:
        side = int(round(np.sqrt(R)))
        if side * side != R:
            raise ValueError("det_shape required for non-square ray grids")
        det_shape = (side, side)

    A = affine_inverse
    s_vox = jnp.matmul(source, A[:3, :3].T, precision="highest") + A[:3, 3]
    t_vox = jnp.matmul(target, A[:3, :3].T, precision="highest") + A[:3, 3]
    s_vox = jnp.broadcast_to(s_vox, t_vox.shape)
    d_vox = t_vox - s_vox
    raylen = jnp.linalg.norm(target - jnp.broadcast_to(source, target.shape), axis=-1)

    if perm is None:
        d_mean = np.asarray(jax.device_get(jnp.mean(d_vox, axis=(0, 1))))
        perm = _choose_permutation(d_mean)
    march, win, lane = perm
    if packed is None:
        packed, vol_shape = pack_density(density, perm)
    else:
        packed, vol_shape = packed

    s_p = jnp.stack([s_vox[..., march], s_vox[..., win], s_vox[..., lane]], axis=-1)
    d_p = jnp.stack([d_vox[..., march], d_vox[..., win], d_vox[..., lane]], axis=-1)
    wscale = raylen / jnp.clip(jnp.abs(d_p[..., 0]), 1e-6)

    window = min(int(window), int(vol_shape[1]))
    if stream is None:
        stream = packed_table_bytes(vol_shape) > STREAM_THRESHOLD
    Hd0, Wd0 = det_shape
    pad = _shear_pad(det_shape) if remap else 0
    if remap:
        s_p, d_p, wscale, shift, det_shape = _shear_layout(
            s_p, d_p, wscale, vol_shape[0], det_shape, pad
        )
    out = _render_siddon(
        packed, s_p, d_p, wscale,
        det_shape=det_shape,
        vol_shape=vol_shape,
        window=window,
        perm=perm,
        interpret=bool(interpret),
        stream=bool(stream),
    )
    if remap:
        img = _barrel_shear(out.reshape(B, Hd0 + pad, Wd0), shift, pad, Hd0, reverse=True)
        out = img.reshape(B, Hd0 * Wd0)
    return out

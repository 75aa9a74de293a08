"""Hardware smoke test: compile every Pallas kernel family on the real chip.

Interpret-mode tests validate numerics but NOT Mosaic lowering — e.g. an
f32 `broadcasted_iota` passes interpretation yet fails `tpu.iota` rules on
hardware. Run this after touching any kernel in `xvr_tpu/render/` (tiny
shapes, one executable per family; a few minutes through the compile
tunnel):

    python scripts/tpu_smoke.py

Exits nonzero on the first kernel that fails to compile or that diverges
from its XLA golden by more than 2%.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def check(name, fn, ref_fn=None, min_ncc=0.995):
    """Gate on correlation with the golden, not max error: rays grazing the
    volume boundary legitimately differ between integration models (the
    fixed-step golden vs plane-crossing kernels handle the entry/exit
    half-voxel differently), so a single border pixel would fail a max-err
    gate while the images agree everywhere else."""
    t0 = time.perf_counter()
    try:
        out = np.asarray(fn())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        sys.exit(1)
    msg = f"ok   {name}: {time.perf_counter() - t0:.1f}s"
    if ref_fn is not None:
        ref = np.asarray(ref_fn())
        ncc = float(np.corrcoef(out.ravel(), ref.ravel())[0, 1])
        msg += f", ncc {ncc:.5f}"
        if not ncc >= min_ncc:
            print(f"FAIL {name}: ncc {ncc:.5f} < {min_ncc}")
            sys.exit(1)
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"not a TPU backend ({jax.default_backend()}); nothing to smoke")
        return

    from xvr_tpu.geometry import Detector, convert
    from xvr_tpu.render import pallas as pk
    from xvr_tpu.render import shearwarp as sw
    from xvr_tpu.render import xla as golden
    from xvr_tpu.render.volume import Volume, transform_hu_to_density

    rng = np.random.default_rng(0)
    N, H, B = 64, 64, 4
    hu = rng.uniform(-1000.0, 1500.0, size=(N, N, N)).astype(np.float32)
    # smooth: the kernels use different quadratures (fixed-step vs plane
    # crossings), which legitimately diverge a few % on voxel-scale noise;
    # this smoke test gates COMPILATION + gross numerics, not quadrature
    for ax in range(3):
        hu = (np.roll(hu, 1, ax) + hu + np.roll(hu, -1, ax)) / 3.0
    aff = np.eye(4, dtype=np.float32) * 2.0
    aff[3, 3] = 1.0
    aff[:3, 3] = -(N - 1)
    vol = Volume(data=jnp.asarray(hu), affine=jnp.asarray(aff))
    density = transform_hu_to_density(vol.data, 2.0)
    affinv = vol.affine_inverse
    det = Detector(sdd=400.0, height=H, width=H, delx=2.0, dely=2.0)
    pose = convert(
        jnp.asarray([[5.0 * i, 3.0, -2.0] for i in range(B)], jnp.float32),
        jnp.asarray([[0.0, 300.0, 5.0]] * B, jnp.float32),
        "euler_angles", "ZXY", degrees=True,
    )
    src, tgt = det.rays(pose)

    perm = pk.choose_permutation_for_pose(np.eye(3), np.asarray(affinv))
    margs = (np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm,
             (H, H), tuple(int(density.shape[a]) for a in perm))
    w = int(-(-pk.measured_window_span(*margs) // 8) * 8)

    check(
        "slab trilinear",
        lambda: pk.raymarch_trilinear_pallas(density, affinv, src, tgt, window=w, perm=perm),
        lambda: golden.raymarch_trilinear(density, affinv, src, tgt, n_samples=2048),
    )
    check(
        "exact siddon",
        lambda: pk.raymarch_siddon_pallas(density, affinv, src, tgt, window=w + 8, perm=perm),
        lambda: golden.raymarch_siddon(density, affinv, src, tgt),
    )

    ww = int(-(-sw.measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H)) // 8) * 8)
    check(
        "shearwarp trilinear (fused fwd)",
        lambda: sw.raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, perm=perm, warp_window=ww),
        lambda: golden.raymarch_trilinear(density, affinv, src, tgt, n_samples=2048),
    )
    check(
        "shearwarp siddon",
        lambda: sw.raymarch_siddon_shearwarp(
            density, affinv, src, tgt, perm=perm, warp_window=ww),
        lambda: golden.raymarch_siddon(density, affinv, src, tgt),
        # the siddon FLAVOR is a narrow-trapezoid smoothing of the exact
        # piecewise-constant integral; on voxel-scale noise (this phantom)
        # the smoothing costs a little correlation that it does not cost on
        # anatomy-smooth volumes (tests/test_shearwarp.py:155 passes at 2%)
        min_ncc=0.98,
    )

    def fast_grad():
        def f(t):
            s2, t2 = det.rays(convert(
                jnp.asarray([[0.0, 3.0, -2.0]], jnp.float32),
                jnp.asarray([[0.0, t, 5.0]], jnp.float32),
                "euler_angles", "ZXY", degrees=True,
            ))
            return sw.raymarch_trilinear_fast(
                density, affinv, s2, t2, perm=perm, warp_window=ww
            ).sum()
        return jax.grad(f)(300.0)

    check("shearwarp analytic adjoint (grad)", fast_grad)

    from xvr_tpu.train.augmentations import clahe

    img = jnp.asarray(rng.uniform(size=(B, 1, H, H)).astype(np.float32))
    check(
        "MXU CLAHE",
        lambda: clahe(img, clip_limit=jnp.full((B,), 4.0), grid=4, n_bins=16),
    )
    print("all kernel families compiled and matched on", jax.devices()[0])


if __name__ == "__main__":
    main()

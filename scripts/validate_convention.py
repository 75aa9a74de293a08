"""Validate the pose convention against (converted) DeepFluoro/Ljubljana data.

The one risk this repo cannot fully discharge offline is the SE(3) pose
convention against *real* scanner data (documented in
``xvr_tpu/geometry/se3.py``): every in-repo proof runs against synthetic
fixtures built with the same convention. This script is the ready-to-run
check for the day real data is mounted — for each converted X-ray it renders
the STORED ground-truth pose through the production renderer stack (same
intrinsics plumbing as ``xvr register``: header intrinsics, ``x0`` sign flip,
DeepFluoro axis-flip mapper from ``scripts/evaluate.py``) and reports image
similarity (mNCC / gradient-NCC) between the rendered DRR and the paired
X-ray. A correct convention yields high NCC; a flipped axis or transposed
rotation collapses it.

Usage (after ``scripts/convert_datasets.py``):
    python scripts/validate_convention.py data deepfluoro            # all subjects
    python scripts/validate_convention.py data deepfluoro -s subject01 -n 4

Exit code 1 when any X-ray falls below ``--threshold`` (default 0.4 mNCC —
real X-rays vs DRRs land well above this when the geometry is right, and
near 0 when it is wrong).

Caveat: the check is weak against exactly one error class — the ANTIPODAL
pose (180 deg about the detector normal, e.g. a missing DeepFluoro mapper
flip), because X-ray line integrals are nearly direction-independent: the
projection from the opposite side, detector rotated 180 deg, differs only by
cone-beam magnification asymmetry (this is the same PA/AP ambiguity the
reference resolves with ``_construct_antipode``,
/root/reference/src/xvr/model/inference.py:41-55). Catch that case by its
mTRE in ``scripts/evaluate.py``; this script catches everything that moves
the viewed geometry (transposed rotations, wrong axis flips/order, unit or
sign errors in translation, intrinsics mismatches).

Reference semantics: gt pose storage /root/reference/utils/dcmwrite.py:160-177,
mapper /root/reference/scripts/evaluate.py:45-62, intrinsics sign flip
/root/reference/src/xvr/registrar/base.py:147.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def _load_evaluate():
    spec = importlib.util.spec_from_file_location(
        "xvr_evaluate", Path(__file__).resolve().parent / "evaluate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["xvr_evaluate"] = mod
    spec.loader.exec_module(mod)
    return mod


def validate_xray(volpath, maskpath, dcmpath, gt_pose, crop, linearize, size):
    """-> dict of similarity figures for one (X-ray, stored-pose) pair."""
    import jax.numpy as jnp

    from xvr_tpu.io import read_xray
    from xvr_tpu.metrics import gradient_ncc, multiscale_ncc
    from xvr_tpu.render.load import initialize_drr
    from xvr_tpu.utils.transforms import make_xray_transforms

    gt, sdd, delx, dely, x0, y0, _ = read_xray(
        dcmpath, crop=crop, linearize=linearize
    )
    H, W = gt.shape[-2:]
    proj = initialize_drr(
        volpath, maskpath, None, "AP",
        height=H, width=W, sdd=sdd, delx=delx, dely=dely,
        x0=-x0, y0=y0,  # reference's x0 sign flip (registrar/base.py:147)
        reverse_x_axis=False, renderer="trilinear",
    )
    # render at a pyramid scale (full 1436^2 is wasteful for a yes/no check);
    # mNCC is computed on the matching downsampled pair
    scale = max(H, W) / float(size)
    proj_s = proj.rescale_detector(scale)
    h, w = proj_s.detector.height, proj_s.detector.width
    transform = make_xray_transforms(h, w, use_equalize=False)
    pred = np.asarray(proj_s(gt_pose))
    a = transform(jnp.asarray(gt))
    b = transform(jnp.asarray(pred))
    mncc = float(np.squeeze(multiscale_ncc(a, b, (None, 9), (0.5, 0.5))))
    gncc = float(np.squeeze(gradient_ncc(a, b, 11, 10)))
    return {"mncc": mncc, "gncc": gncc, "render_hw": (h, w)}


@click.command()
@click.argument("data_root", type=click.Path(exists=True))
@click.argument("dataset", type=click.Choice(["deepfluoro", "ljubljana"]))
@click.option("-s", "--subject", default=None, help="Restrict to one subject dir")
@click.option("-n", "--n-xrays", default=4, show_default=True,
              help="X-rays checked per subject")
@click.option("--crop", default=0, show_default=True, help="Edge crop (px)")
@click.option("--linearize/--no-linearize", default=True, show_default=True,
              help="Log-linearize the X-ray (real data: yes)")
@click.option("--size", default=256, show_default=True,
              help="Render/compare resolution (longest side)")
@click.option("--threshold", default=0.4, show_default=True,
              help="Minimum acceptable mNCC per X-ray")
def main(data_root, dataset, subject, n_xrays, crop, linearize, size, threshold):
    ev = _load_evaluate()
    root = Path(data_root) / dataset
    subjects = [root / subject] if subject else sorted(
        p for p in root.iterdir() if (p / "xrays").is_dir()
    )
    failures, checked = [], 0
    for sub in subjects:
        vol = sub / "volume.nii.gz"
        mask = sub / "mask.nii.gz"
        npzs = sorted((sub / "xrays").glob("*.npz"))[:n_xrays]
        for npz in npzs:
            dcm = npz.with_suffix(".dcm")
            if not dcm.exists():
                continue
            gt_pose, _ = ev.read_true(dataset, sub.name, npz.stem, data_root)
            r = validate_xray(
                vol, mask if mask.exists() else None, dcm, gt_pose,
                crop, linearize, size,
            )
            checked += 1
            ok = r["mncc"] >= threshold
            if not ok:
                failures.append((sub.name, npz.stem, r["mncc"]))
            print(
                f"{sub.name}/{npz.stem}: mNCC={r['mncc']:+.4f} "
                f"gNCC={r['gncc']:+.4f} @ {r['render_hw'][0]}x{r['render_hw'][1]}"
                f"  [{'ok' if ok else 'FAIL'}]",
                flush=True,
            )
    if checked == 0:
        raise click.ClickException(f"no (dcm, npz) pairs found under {root}")
    if failures:
        print(
            f"\nCONVENTION CHECK FAILED: {len(failures)}/{checked} X-rays "
            f"below mNCC {threshold} — the stored poses do not reproduce the "
            "measured projections through this renderer stack.",
            flush=True,
        )
        sys.exit(1)
    print(f"\nConvention check passed: {checked} X-rays >= mNCC {threshold}.")


if __name__ == "__main__":
    main()

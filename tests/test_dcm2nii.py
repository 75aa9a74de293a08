"""DICOM-series -> NIfTI conversion (`xvr dcm2nii`, xvr_tpu/io/dcm2nii.py).

Reference behavior: /root/reference/src/xvr/cli/commands/dcm2nii.py:6-17
(torchio-based); here the converter sorts slices along the orientation
normal, applies RescaleSlope/Intercept, and assembles an LPS->RAS affine.
"""

from pathlib import Path

import numpy as np

from xvr_tpu.io import dcmwrite
from xvr_tpu.io.dcm2nii import dicom_series_to_nifti
from xvr_tpu.io.nifti import load_nifti

ROWS, COLS, SLICES = 16, 12, 8
SP_ROW, SP_COL, DZ = 1.5, 2.0, 3.0


def _write_series(d: Path, shuffle: bool = True):
    """CT-like series: HU = f(r, c, s); stored uint16 with intercept -1024."""
    rng = np.random.default_rng(0)
    hu = rng.integers(-1000, 1500, size=(ROWS, COLS, SLICES)).astype(np.float32)
    order = rng.permutation(SLICES) if shuffle else np.arange(SLICES)
    origin = np.array([5.0, -7.0, 11.0])
    for k in order:
        stored = (hu[:, :, k] + 1024.0).astype(np.uint16)
        pos = origin + np.array([0.0, 0.0, DZ * k])
        extra = [
            (0x0020, 0x0032, b"DS", [f"{v:g}" for v in pos]),
            (0x0020, 0x0037, b"DS", ["1", "0", "0", "0", "1", "0"]),
            (0x0028, 0x1052, b"DS", "-1024"),
            (0x0028, 0x1053, b"DS", "1"),
            (0x0018, 0x0050, b"DS", f"{DZ:g}"),
        ]
        # filenames NOT in slice order: conversion must sort by position
        dcmwrite(
            d / f"slice_{SLICES - k:03d}.dcm", stored, sdd=0.0,
            row_spacing=SP_ROW, col_spacing=SP_COL, extra=extra,
        )
    return hu, origin


def test_series_to_nifti_sorts_rescales_and_orients(tmp_path):
    hu, origin = _write_series(tmp_path)
    out = dicom_series_to_nifti(tmp_path, tmp_path / "ct.nii.gz")
    data, affine = load_nifti(out)

    assert data.shape == (ROWS, COLS, SLICES)
    np.testing.assert_allclose(data, hu, atol=1e-3)

    # axis0 = rows (col_dir), axis1 = cols (row_dir), axis2 = normal; LPS->RAS
    expect = np.zeros((4, 4))
    expect[3, 3] = 1.0
    expect[:3, 0] = [0.0, -SP_ROW, 0.0]
    expect[:3, 1] = [-SP_COL, 0.0, 0.0]
    expect[:3, 2] = [0.0, 0.0, DZ]
    expect[:3, 3] = [-origin[0], -origin[1], origin[2]]
    np.testing.assert_allclose(affine, expect, atol=1e-6)


def test_cli_dcm2nii(tmp_path):
    from click.testing import CliRunner

    from xvr_tpu.cli.cli import cli

    _write_series(tmp_path)
    out = tmp_path / "out" / "ct.nii.gz"
    r = CliRunner().invoke(
        cli, ["dcm2nii", str(tmp_path), str(out)], catch_exceptions=False
    )
    assert r.exit_code == 0, r.output
    data, _ = load_nifti(out)
    assert data.shape == (ROWS, COLS, SLICES)


def test_multiframe_series_frame_spacing(tmp_path):
    """Multiframe files contribute one z per FRAME: two 4-frame files at
    z=0 and z=4 with 1 mm frame spacing make an 8-slice volume with a
    1 mm slab step (not the 4 mm per-file step)."""
    rng = np.random.default_rng(1)
    frames_a = rng.integers(0, 4000, size=(4, 8, 8)).astype(np.uint16)
    frames_b = rng.integers(0, 4000, size=(4, 8, 8)).astype(np.uint16)
    for name, arr, z in (("a.dcm", frames_a, 0.0), ("b.dcm", frames_b, 4.0)):
        extra = [
            (0x0020, 0x0032, b"DS", ["0", "0", f"{z:g}"]),
            (0x0020, 0x0037, b"DS", ["1", "0", "0", "0", "1", "0"]),
            (0x0018, 0x0088, b"DS", "1"),  # SpacingBetweenSlices (per frame)
        ]
        dcmwrite(tmp_path / name, arr, sdd=0.0, row_spacing=1.0, col_spacing=1.0,
                 extra=extra)
    out = dicom_series_to_nifti(tmp_path, tmp_path / "ct.nii.gz")
    data, affine = load_nifti(out)
    assert data.shape == (8, 8, 8)
    np.testing.assert_allclose(affine[2, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(data[:, :, 0], frames_a[0].astype(np.float32))
    np.testing.assert_allclose(data[:, :, 4], frames_b[0].astype(np.float32))

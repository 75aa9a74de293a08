"""DICOM reader/writer round-trip and X-ray preprocessing tests."""

import numpy as np
import pytest

from xvr_tpu.io import dcmread, dcmwrite, pixel_array, read_xray
from xvr_tpu.io.xray import _preprocess_xray


@pytest.fixture()
def xray_file(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 4000, size=(32, 48))).astype(np.uint16)
    p = tmp_path / "xray.dcm"
    dcmwrite(p, img, sdd=1020.0, row_spacing=0.194, col_spacing=0.2,
             row_origin=1.5, col_origin=-2.5)
    return p, img


def test_dicom_roundtrip(xray_file):
    p, img = xray_file
    ds = dcmread(p)
    assert int(ds.Rows) == 32 and int(ds.Columns) == 48
    assert float(ds.DistanceSourceToDetector) == 1020.0
    assert [float(v) for v in ds.PixelSpacing] == [0.194, 0.2]
    assert [float(v) for v in ds.DetectorActiveOrigin] == [1.5, -2.5]
    np.testing.assert_array_equal(pixel_array(ds), img)


def test_read_xray_intrinsics(xray_file):
    p, img = xray_file
    arr, sdd, delx, dely, x0, y0, pf_to_af = read_xray(p, linearize=False)
    assert arr.shape == (1, 1, 32, 48)
    assert sdd == 1020.0
    assert (dely, delx) == (0.194, 0.2)
    assert (y0, x0) == (1.5, -2.5)
    assert pf_to_af is False
    assert 0.0 <= arr.min() and arr.max() <= 1.0 + 1e-6


def test_read_xray_crop(xray_file):
    p, _ = xray_file
    arr, *_ = read_xray(p, crop=8, linearize=False)
    assert arr.shape == (1, 1, 24, 40)


def test_preprocess_linearize():
    img = np.linspace(0, 1, 16, dtype=np.float32).reshape(1, 1, 4, 4)
    out = _preprocess_xray(img.copy(), 0, False, True, "max")
    # linearized: log(max) - log(img+1); brightest pixel -> 0, monotone decreasing
    assert out.reshape(-1)[-1] == pytest.approx(0.0, abs=1e-6)
    assert (np.diff(out.reshape(-1)) <= 1e-6).all()


def test_preprocess_background_subtraction():
    img = np.full((1, 1, 8, 8), 0.5, dtype=np.float32)
    img[0, 0, :2] = 1.0
    out = _preprocess_xray(img.copy(), 0, True, False, "max")
    # the mode (background) maps to 1.0 after clip+shift
    assert out[0, 0, 4, 4] == pytest.approx(1.0, abs=1e-5)


def test_multiframe_reduce(tmp_path):
    frames = np.stack([np.full((8, 8), i * 100, np.uint16) for i in range(3)])
    p = tmp_path / "mf.dcm"
    dcmwrite(p, frames, sdd=1000.0, row_spacing=1.0, col_spacing=1.0)
    ds = dcmread(p)
    assert int(ds.NumberOfFrames) == 3
    arr, *_ = read_xray(p, linearize=False, reducefn="max")
    assert arr.shape == (1, 1, 8, 8)
    arr_idx, *_ = read_xray(p, linearize=False, reducefn=0)
    assert arr_idx.shape == (1, 1, 8, 8)
    assert arr_idx.max() == 0.0  # frame 0 was all zeros -> rescaled zeros

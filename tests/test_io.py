"""IO tests: NIfTI round trip, canonical reorientation, volume reading, ITK."""

import numpy as np
import pytest

from xvr_tpu.io import load_nifti, read, save_nifti, to_canonical
from xvr_tpu.utils.itk import get_4x4, read_itk_transform


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(size=(8, 10, 12)).astype(np.float32)
    affine = np.array(
        [[2.0, 0, 0, -8.0], [0, 1.5, 0, -7.5], [0, 0, 1.0, -6.0], [0, 0, 0, 1.0]]
    )
    for name in ["vol.nii", "vol.nii.gz"]:
        p = tmp_path / name
        save_nifti(p, data, affine)
        d2, a2 = load_nifti(p)
        np.testing.assert_allclose(d2, data, rtol=1e-6)
        np.testing.assert_allclose(a2, affine, rtol=1e-5)


def test_nifti_int16_scaling(tmp_path):
    data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    affine = np.eye(4)
    p = tmp_path / "v.nii.gz"
    save_nifti(p, data, affine)
    d2, _ = load_nifti(p)
    np.testing.assert_allclose(d2, data)


def test_to_canonical_identity():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    d2, a2 = to_canonical(data, affine)
    np.testing.assert_allclose(d2, data)
    np.testing.assert_allclose(a2, affine)


def test_to_canonical_flip_preserves_world_positions():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(4, 5, 6)).astype(np.float32)
    affine = np.diag([-1.0, 1.0, 1.0, 1.0])  # LAS -> needs x flip
    affine[:3, 3] = [3.0, -2.0, 0.0]
    d2, a2 = to_canonical(data, affine)
    # world position of voxel (i,j,k) must be preserved under reorientation
    for idx in [(0, 0, 0), (3, 4, 5), (1, 2, 3)]:
        w1 = affine[:3, :3] @ idx + affine[:3, 3]
        # find the new index holding the same value
        val = data[idx]
        loc = np.argwhere(np.isclose(d2, val))[0]
        w2 = a2[:3, :3] @ loc + a2[:3, 3]
        np.testing.assert_allclose(w1, w2, atol=1e-6)
    assert np.all(np.diag(a2[:3, :3]) > 0)


def test_read_with_mask_and_labels(tmp_path):
    data = (np.random.default_rng(0).normal(size=(6, 6, 6)) * 100).astype(np.float32)
    mask = np.zeros((6, 6, 6), dtype=np.float32)
    mask[:3] = 1
    mask[3:, :3] = 2
    mask[3:, 3:, :3] = 7
    save_nifti(tmp_path / "vol.nii.gz", data, np.eye(4))
    save_nifti(tmp_path / "mask.nii.gz", mask, np.eye(4))
    v = read(tmp_path / "vol.nii.gz", tmp_path / "mask.nii.gz", labels="1,7")
    labs = set(np.unique(np.asarray(v.mask)))
    assert labs == {0, 1, 7}  # label 2 dropped
    # --labels means "exclusively render these structures": everything
    # outside the kept labels becomes air (renders as zero density)
    d = np.asarray(v.data)
    m = np.asarray(v.mask)
    assert np.all(d[m == 0] == -1000.0)
    assert np.allclose(d[m > 0], data[np.isin(mask.astype(int), [1, 7])])


def test_read_mask_shape_mismatch(tmp_path):
    save_nifti(tmp_path / "vol.nii.gz", np.zeros((4, 4, 4), np.float32), np.eye(4))
    save_nifti(tmp_path / "m.nii.gz", np.zeros((5, 4, 4), np.float32), np.eye(4))
    with pytest.raises(ValueError, match="mask shape"):
        read(tmp_path / "vol.nii.gz", tmp_path / "m.nii.gz")


ITK_TXT = """#Insight Transform File V1.0
#Transform 0
Transform: AffineTransform_double_3_3
Parameters: 1 0 0 0 1 0 0 0 1 5 -3 2
FixedParameters: 0 0 0
"""


def test_read_itk_transform(tmp_path):
    p = tmp_path / "warp.txt"
    p.write_text(ITK_TXT)
    params, fixed = read_itk_transform(p)
    np.testing.assert_allclose(params[:9].reshape(3, 3), np.eye(3))
    np.testing.assert_allclose(params[9:], [5.0, -3.0, 2.0])


def test_get_4x4_pure_translation(tmp_path):
    (tmp_path / "warp.txt").write_text(ITK_TXT)
    data = np.zeros((4, 4, 4), np.float32)
    affine = np.eye(4)
    save_nifti(tmp_path / "vol.nii.gz", data, affine)
    T = get_4x4(tmp_path / "warp.txt", tmp_path / "vol.nii.gz")
    R = np.asarray(T.R)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-5)
    # LPS translation (5,-3,2) -> RAS (-5,3,2), then shifted by the negative
    # volume center (1.5, 1.5, 1.5) per the reference's Tinv composition
    np.testing.assert_allclose(
        np.asarray(T.t).reshape(-1), [-6.5, 1.5, 0.5], atol=1e-5
    )

"""Golden tests for the XLA renderers: analytic phantoms, convergence, grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import Detector, RigidTransform, convert
from xvr_tpu.render import (
    Projector,
    make_test_volume,
    raymarch_siddon,
    raymarch_trilinear,
)


def ap_pose(dist=400.0, n=1):
    """RAW detector pose: source at (0, dist, 0) looking down -y through the
    origin (no orientation reorient — for direct Detector.rays use)."""
    return convert(
        jnp.zeros((n, 3)), jnp.tile(jnp.array([[0.0, dist, 0.0]]), (n, 1)),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )


def view_pose(dist=400.0, n=1, rot=(180.0, 0.0, 0.0)):
    """PROJECTOR pose in the reference's convention: with the AP reorient,
    alpha ~ 180 deg + ty > 0 views a volume at the origin."""
    return convert(
        jnp.tile(jnp.array([list(rot)]), (n, 1)),
        jnp.tile(jnp.array([[0.0, dist, 0.0]]), (n, 1)),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )


@pytest.fixture(scope="module")
def cube_vol():
    # 32^3 volume, unit spacing, centered at origin; density-1 cube of half-width 8
    return make_test_volume(32, spacing=1.0, kind="cube")


def center_ray_integral(volume, renderer, sdd=800.0, dist=400.0, height=9, delx=0.5):
    proj = Projector.from_volume(
        volume, sdd=sdd, height=height, delx=delx, renderer=renderer, n_samples=512
    )
    # volume.data is already "density" for phantoms; bypass HU transfer
    proj = proj.replace(density=volume.data)
    img = proj(view_pose(dist))
    return np.asarray(img)


@pytest.mark.parametrize("renderer", ["siddon", "trilinear"])
def test_central_ray_path_length_cube(cube_vol, renderer):
    """The central ray passes straight through the cube: integral = side length."""
    img = center_ray_integral(cube_vol, renderer)
    c = img.shape[-1] // 2
    # cube: |X - 15.5| <= 8 covers integer indices 8..23 -> 16 unit-density
    # voxels -> 16 mm path length; trilinear smears edges by ~1 voxel
    tol = 0.02 if renderer == "siddon" else 0.6
    np.testing.assert_allclose(img[0, 0, c, c], 16.0, atol=tol)


@pytest.mark.parametrize("renderer", ["siddon", "trilinear"])
def test_ray_outside_cube_is_zero(cube_vol, renderer):
    img = center_ray_integral(cube_vol, renderer, height=33, delx=2.0)
    # corner rays miss the cube entirely
    assert abs(img[0, 0, 0, 0]) < 1e-3
    assert abs(img[0, 0, -1, -1]) < 1e-3


def test_siddon_oblique_exactness():
    """An oblique ray's Siddon integral equals the analytic chord length."""
    vol = make_test_volume(24, spacing=1.0, kind="cube")  # cube half-width 6
    # A single ray at a known angle through the center
    source = jnp.array([[[300.0, 300.0, 0.0]]])  # 45 deg in the x-y plane
    target = jnp.array([[[-300.0, -300.0, 0.0]]])
    img = raymarch_siddon(vol.data, vol.affine_inverse, source, target)
    # cube |X - 11.5| <= 6 covers indices 6..17 -> 12-voxel box; the 45 deg
    # diagonal chord through a 12 x 12 square has length 12*sqrt(2)
    np.testing.assert_allclose(np.asarray(img)[0, 0], 12.0 * np.sqrt(2), rtol=1e-3)


def test_trilinear_converges_to_siddon():
    # A smooth (linear-ramp) volume: trilinear interpolation is exact for it,
    # so both renderers converge to the same analytic line integral. (On
    # voxel-noise volumes the two renderers legitimately differ: piecewise-
    # constant vs interpolated density models.)
    vol = make_test_volume(32, spacing=1.0, kind="gradient")
    det = Detector(sdd=800.0, height=16, width=16, delx=1.5, dely=1.5)
    pose = ap_pose(400.0)
    src, tgt = det.rays(pose)
    exact = np.asarray(raymarch_siddon(vol.data, vol.affine_inverse, src, tgt))
    approx = np.asarray(
        raymarch_trilinear(vol.data, vol.affine_inverse, src, tgt, n_samples=1024)
    )
    err = np.abs(exact - approx).max() / max(np.abs(exact).max(), 1e-9)
    assert err < 0.05, f"relative error {err}"


def test_mask_channels_sum_to_total():
    vol = make_test_volume(32, spacing=1.0, kind="random")
    # labelmap: label 1 where x < 16, label 2 where x >= 24
    idx = np.arange(32)
    X = np.broadcast_to(idx[:, None, None], (32, 32, 32))
    mask = np.where(X < 16, 1, np.where(X >= 24, 2, 0)).astype(np.int32)
    vol2 = vol.__class__(data=vol.data, affine=vol.affine, mask=jnp.asarray(mask))
    det = Detector(sdd=800.0, height=8, width=8, delx=2.0, dely=2.0)
    src, tgt = det.rays(ap_pose(400.0))
    for fn, kw in [
        (raymarch_siddon, {}),
        (raymarch_trilinear, {"n_samples": 512}),
    ]:
        total = np.asarray(fn(vol2.data, vol2.affine_inverse, src, tgt, **kw))
        chans = np.asarray(
            fn(vol2.data, vol2.affine_inverse, src, tgt, mask=vol2.mask, labels=(1, 2), **kw)
        )
        assert chans.shape[1] == 3
        np.testing.assert_allclose(chans.sum(axis=1), total, rtol=2e-2, atol=1e-2)
        assert chans[:, 1:].sum() > 0  # foreground channels nonempty


@pytest.mark.parametrize("renderer_fn,kw", [
    (raymarch_trilinear, {"n_samples": 64}),
    (raymarch_siddon, {}),
])
def test_pose_gradients_nonzero_and_finite(renderer_fn, kw):
    # Smooth ramp phantom: line integrals vary continuously with the pose, so
    # both renderers must report nonzero, finite pose gradients. (On binary
    # axis-aligned phantoms exact Siddon gradients are legitimately ~0: chord
    # lengths are locally translation-invariant.)
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    det = Detector(sdd=600.0, height=8, width=8, delx=4.0, dely=4.0)

    def loss(params):
        alpha, ty = params
        rot = jnp.stack([alpha, jnp.zeros(()), jnp.zeros(())])[None]
        xyz = jnp.stack([jnp.zeros(()), ty, jnp.zeros(())])[None]
        pose = convert(rot, xyz, parameterization="euler_angles", convention="ZXY")
        src, tgt = det.rays(pose)
        img = renderer_fn(vol.data, vol.affine_inverse, src, tgt, **kw)
        return jnp.sum(img**2)

    # small rotation: 0.02 rad at 300 mm standoff keeps the beam on the volume
    g = jax.grad(loss)(jnp.array([0.02, 300.0]))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).min()) > 0


def test_trilinear_density_gradients():
    vol = make_test_volume(16, spacing=2.0, kind="sphere")
    det = Detector(sdd=600.0, height=4, width=4, delx=8.0, dely=8.0)
    src, tgt = det.rays(ap_pose(300.0))

    def loss(density):
        return jnp.sum(raymarch_trilinear(density, vol.affine_inverse, src, tgt, n_samples=64))

    g = jax.grad(loss)(vol.data)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_projector_call_shapes(cube_vol):
    proj = Projector.from_volume(cube_vol, sdd=800.0, height=16, delx=1.0, n_samples=64)
    img = proj(view_pose(400.0, n=3))
    assert img.shape == (3, 1, 16, 16)
    # unbatched pose
    pose1 = RigidTransform(view_pose(400.0).matrix[0])
    img1 = proj(pose1)
    assert img1.shape == (1, 16, 16)


def test_projector_rescale_pyramid(cube_vol):
    proj = Projector.from_volume(cube_vol, sdd=800.0, height=64, delx=0.5, n_samples=64)
    small = proj.rescale_detector(4.0)
    assert small.detector.height == 16
    img = small(view_pose(400.0))
    assert img.shape == (1, 1, 16, 16)


def test_magnification():
    """Perspective: a cube at half source-detector distance magnifies 2x."""
    vol = make_test_volume(32, spacing=1.0, kind="cube")
    proj = Projector.from_volume(vol, sdd=800.0, height=64, delx=1.0, n_samples=256)
    proj = proj.replace(density=vol.data)
    img = np.asarray(proj(view_pose(400.0)))[0, 0]  # magnification 800/400 = 2
    row = img[32]
    width_px = (row > row.max() * 0.5).sum()
    # cube width 16mm, magnified 2x -> 32mm -> 32 px at delx=1
    assert 28 <= width_px <= 36, width_px


def test_load_example_ct_and_initialize_drr(tmp_path):
    from xvr_tpu.io import save_nifti
    from xvr_tpu.render import initialize_drr, load_example_ct

    vol = load_example_ct()
    assert vol.data.shape == (96, 96, 96)
    proj = Projector.from_volume(vol, sdd=1020.0, height=32, delx=8.0, n_samples=96)
    img = np.asarray(proj(view_pose(700.0)))
    assert img.max() > 0  # example CT renders non-empty in the AP convention

    save_nifti(tmp_path / "ct.nii.gz", np.asarray(vol.data), np.asarray(vol.affine))
    proj2 = initialize_drr(
        tmp_path / "ct.nii.gz", None, None, "AP",
        height=16, width=16, sdd=1020.0, delx=8.0, dely=8.0,
        x0=0.0, y0=0.0, reverse_x_axis=False, renderer="trilinear",
    )
    assert proj2.detector.height == 16


def test_initialize_drr_labels_exclusively_render(tmp_path):
    """--labels semantics (reference register.py:72): the DRR built with
    labels renders ONLY those structures — identical to rendering a volume
    where everything else was replaced by air — and still yields ONE image
    (no channel split in the registration path)."""
    from xvr_tpu.io import save_nifti
    from xvr_tpu.render import initialize_drr

    vol = make_test_volume(24, spacing=4.0, kind="sphere")
    hu = np.asarray(vol.data)
    mask = np.zeros_like(hu, dtype=np.float32)
    mask[hu > 300.0] = 1.0  # bone core
    mask[(hu > -500.0) & (hu <= 300.0)] = 2.0  # soft shell
    save_nifti(tmp_path / "ct.nii.gz", hu, np.asarray(vol.affine))
    save_nifti(tmp_path / "mask.nii.gz", mask, np.asarray(vol.affine))

    kw = dict(
        orientation="AP", height=24, width=24, sdd=400.0, delx=6.0, dely=6.0,
        x0=0.0, y0=0.0, reverse_x_axis=False, renderer="trilinear",
    )
    proj_all = initialize_drr(tmp_path / "ct.nii.gz", tmp_path / "mask.nii.gz", None, **kw)
    proj_bone = initialize_drr(tmp_path / "ct.nii.gz", tmp_path / "mask.nii.gz", "1", **kw)

    hu_boneonly = np.where(mask == 1.0, hu, -1000.0).astype(np.float32)
    save_nifti(tmp_path / "bone.nii.gz", hu_boneonly, np.asarray(vol.affine))
    proj_ref = initialize_drr(tmp_path / "bone.nii.gz", None, None, **kw)

    pose = view_pose(300.0)
    img_all = np.asarray(proj_all(pose))
    img_bone = np.asarray(proj_bone(pose))
    img_ref = np.asarray(proj_ref(pose))
    assert img_bone.shape == img_all.shape == (1, 1, 24, 24)  # single image
    np.testing.assert_allclose(img_bone, img_ref, rtol=1e-5, atol=1e-5)
    assert np.abs(img_bone - img_all).max() > 1e-3  # labels actually restrict


def test_ray_chunked_trilinear_matches_full():
    """ray_chunk processes rays in lax.map pieces (bounded memory at full
    detector resolution) with identical results, channels included."""
    vol = make_test_volume(24, spacing=2.0, kind="sphere")
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = convert(jnp.asarray([[4.0, -2.0, 3.0]]), jnp.asarray([[2.0, 200.0, -3.0]]),
                   "euler_angles", "ZXY", degrees=True)
    src, tgt = det.rays(pose)
    full = np.asarray(raymarch_trilinear(vol.data, vol.affine_inverse, src, tgt, n_samples=64))
    chunked = np.asarray(raymarch_trilinear(
        vol.data, vol.affine_inverse, src, tgt, n_samples=64, ray_chunk=100))
    np.testing.assert_allclose(chunked, full, rtol=1e-6)
    mask = jnp.asarray((np.asarray(vol.data) > 0.3).astype(np.int32))
    f2 = np.asarray(raymarch_trilinear(
        vol.data, vol.affine_inverse, src, tgt, n_samples=64, mask=mask, labels=(1,)))
    c2 = np.asarray(raymarch_trilinear(
        vol.data, vol.affine_inverse, src, tgt, n_samples=64, mask=mask, labels=(1,),
        ray_chunk=100))
    np.testing.assert_allclose(c2, f2, rtol=1e-6)

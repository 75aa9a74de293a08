"""Detector geometry tests: ray construction, projections, rescaling."""

import jax.numpy as jnp
import numpy as np

from xvr_tpu.geometry import Detector, RigidTransform, convert


def identity_pose(n=1):
    return RigidTransform(jnp.broadcast_to(jnp.eye(4), (n, 4, 4)))


def test_ray_shapes():
    det = Detector(sdd=1020.0, height=8, width=6, delx=2.0, dely=2.0)
    src, tgt = det.rays(identity_pose(3))
    assert src.shape == (3, 1, 3)
    assert tgt.shape == (3, 48, 3)


def test_source_at_pose_translation():
    det = Detector(sdd=1020.0, height=4, width=4, delx=1.0, dely=1.0)
    pose = convert(
        jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 700.0, 0.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )
    src, tgt = det.rays(pose)
    np.testing.assert_allclose(np.asarray(src)[0, 0], [0.0, 700.0, 0.0], atol=1e-5)
    # Detector plane sits at y = 700 - sdd
    np.testing.assert_allclose(np.asarray(tgt)[0, :, 1], 700.0 - 1020.0, atol=1e-4)


def test_carm_orbit_looks_at_origin():
    """With xyz=(0, ty, 0), the central ray passes through the world origin
    for EVERY rotation — the C-arm orbit implied by the reference's training
    sweeps (scripts/femur/train/de_novo.sh r1 in [75, 270] with ty in
    [650, 950]) and DICOM positioner geometry (io/xray.py:77-90)."""
    det = Detector(sdd=1020.0, height=3, width=3, delx=1.0, dely=1.0)
    alphas = [0.0, 45.0, 90.0, 135.0, 180.0, 225.0, 270.0]
    betas = [0.0, -45.0, 30.0, 0.0, 10.0, -20.0, 45.0]
    rot = jnp.array([[a, b, 0.0] for a, b in zip(alphas, betas)])
    xyz = jnp.array([[0.0, 742.0, 0.0]] * len(alphas))
    pose = convert(rot, xyz, parameterization="euler_angles", convention="ZXY", degrees=True)
    src, tgt = det.rays(pose)
    src = np.asarray(src)[:, 0]  # (B, 3)
    ctr = np.asarray(tgt).reshape(len(alphas), 3, 3, 3)[:, 1, 1]  # central pixel
    # source orbits at radius ty
    np.testing.assert_allclose(np.linalg.norm(src, axis=-1), 742.0, atol=1e-3)
    # the central ray passes within a pixel of the origin
    d = ctr - src
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    miss = src - (src * d).sum(-1, keepdims=True) * d
    np.testing.assert_allclose(np.linalg.norm(miss, axis=-1), 0.0, atol=1e-2)


def test_detector_grid_centered():
    det = Detector(sdd=1000.0, height=4, width=4, delx=1.0, dely=1.0)
    _, tgt = det.rays(identity_pose())
    t = np.asarray(tgt)[0]
    # centered: mean of pixel positions is the detector center
    np.testing.assert_allclose(t.mean(axis=0), [0.0, -1000.0, 0.0], atol=1e-5)
    # rows along -z: row-major flattening means first W entries share max z
    assert t[0, 2] > t[-1, 2]


def test_principal_point_shift():
    det0 = Detector(sdd=1000.0, height=4, width=4, delx=1.0, dely=1.0)
    det = Detector(sdd=1000.0, height=4, width=4, delx=1.0, dely=1.0, x0=3.0, y0=-2.0)
    _, t0 = det0.rays(identity_pose())
    _, t1 = det.rays(identity_pose())
    d = np.asarray(t1 - t0)[0]
    np.testing.assert_allclose(d[:, 0], 3.0, atol=1e-5)  # x0 shifts +x (width)
    np.testing.assert_allclose(d[:, 2], 2.0, atol=1e-5)  # y0 shifts rows (v), z = -v


def test_reverse_x_axis():
    det = Detector(sdd=1000.0, height=2, width=4, delx=1.0, dely=1.0)
    rev = det.replace(reverse_x_axis=True)
    _, t = det.rays(identity_pose())
    _, tr = rev.rays(identity_pose())
    np.testing.assert_allclose(np.asarray(t)[0, :, 0], -np.asarray(tr)[0, :, 0], atol=1e-6)


def test_perspective_projection_roundtrip():
    det = Detector(sdd=1020.0, height=128, width=128, delx=0.5, dely=0.5, x0=1.0, y0=-2.0)
    pose = convert(
        jnp.array([[10.0, 20.0, -5.0]]), jnp.array([[10.0, 600.0, -20.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )
    pts = jnp.array([[[5.0, 10.0, -8.0], [0.0, 0.0, 0.0], [-20.0, 15.0, 30.0]]])
    pix = det.perspective_projection(pose, pts)
    back = det.inverse_projection(pose, pix)
    # Backprojected points lie on the ray source -> original point
    src, _ = det.rays(pose)
    src = np.asarray(src)[0, 0]
    for k in range(3):
        p = np.asarray(pts)[0, k]
        b = np.asarray(back)[0, k]
        d1 = (p - src) / np.linalg.norm(p - src)
        d2 = (b - src) / np.linalg.norm(b - src)
        # float32 cancellation over ~600 mm lever arms bounds accuracy
        np.testing.assert_allclose(d1, d2, atol=5e-3)


def test_projection_of_ray_targets_is_pixel_grid():
    det = Detector(sdd=900.0, height=6, width=5, delx=1.3, dely=0.9, x0=0.5, y0=1.5)
    pose = convert(
        jnp.array([[45.0, 10.0, 3.0]]), jnp.array([[0.0, 450.0, 0.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    )
    _, tgt = det.rays(pose)
    pix = np.asarray(det.perspective_projection(pose, tgt))[0]
    cols, rows = np.meshgrid(np.arange(5), np.arange(6))
    np.testing.assert_allclose(pix[:, 0], cols.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(pix[:, 1], rows.reshape(-1), atol=1e-3)


def test_rescale():
    det = Detector(sdd=1020.0, height=1436, width=1436, delx=0.194, dely=0.194)
    small = det.rescale(8.0)
    assert small.height == 180  # round(1436/8) = 180 (reference: int-div semantics vary)
    # physical detector span preserved
    np.testing.assert_allclose(small.height * small.delx, det.height * det.delx, rtol=1e-6)

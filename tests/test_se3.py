"""Tests for RigidTransform: composition semantics, inverse, exp/log, convert."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import RigidTransform, convert, make_translation, se3_exp_map, se3_log_map
from xvr_tpu.geometry.se3 import project_onto_SO3, make_matrix
from xvr_tpu.geometry import so3


def random_pose(key, n=8):
    kq, kt = jax.random.split(key)
    q = jax.random.normal(kq, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = so3.quaternion_to_matrix(q)
    t = 100.0 * jax.random.normal(kt, (n, 3))
    return RigidTransform(make_matrix(R, t))


@pytest.fixture(scope="module")
def poses():
    return random_pose(jax.random.PRNGKey(0))


def test_apply_convention():
    # convert() interprets xyz in the camera frame: x' = R @ (x + xyz)
    T = convert(jnp.array([90.0, 0.0, 0.0]), jnp.array([1.0, 2.0, 3.0]),
                parameterization="euler_angles", convention="ZXY", degrees=True)
    pt = jnp.array([[1.0, 0.0, 0.0]])
    out = T(pt[None]) if T.matrix.ndim == 3 else T(pt)
    # Rz(90) @ ((1,0,0) + (1,2,3)) = Rz(90) @ (2,2,3) = (-2,2,3)
    np.testing.assert_allclose(np.asarray(out).reshape(3), [-2.0, 2.0, 3.0], atol=1e-5)
    # round-trip recovers the camera-frame xyz
    rot, xyz = T.convert("euler_angles", "ZXY", degrees=True)
    np.testing.assert_allclose(np.asarray(xyz), [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot), [90.0, 0.0, 0.0], atol=1e-5)


def test_compose_is_apply_self_then_other(poses):
    a, b = poses[:4], poses[4:]
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3))
    lhs = a.compose(b)(pts)
    rhs = b(a(pts))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_compose_offset_translates_world(poses):
    # pose.compose(make_translation(c)) puts the camera at t + c
    c = jnp.array([10.0, -5.0, 3.0])
    off = make_translation(c)
    composed = poses.compose(off)
    np.testing.assert_allclose(composed.t, poses.t + c, atol=1e-5)
    np.testing.assert_allclose(composed.R, poses.R, atol=1e-6)


def test_inverse(poses):
    eye = poses.compose(poses.inverse())
    np.testing.assert_allclose(
        eye.matrix, np.broadcast_to(np.eye(4), eye.matrix.shape), atol=1e-4
    )


def test_matmul_is_matrix_product(poses):
    a, b = poses[:4], poses[4:]
    np.testing.assert_allclose((a @ b).matrix, a.matrix @ b.matrix, atol=1e-6)


def test_indexing_and_len(poses):
    assert len(poses) == 8
    sub = poses[jnp.array([0, 2])]
    assert sub.matrix.shape == (2, 4, 4)


def test_se3_exp_log_roundtrip():
    key = jax.random.PRNGKey(2)
    omega = 0.8 * jax.random.normal(key, (16, 3))
    upsilon = 50.0 * jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    T = se3_exp_map(omega, upsilon)
    w2, u2 = se3_log_map(T)
    np.testing.assert_allclose(omega, w2, atol=1e-4)
    np.testing.assert_allclose(upsilon, u2, atol=1e-2)


def test_se3_exp_identity():
    T = se3_exp_map(jnp.zeros(3), jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(T.R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T.t, [1.0, 2.0, 3.0], atol=1e-6)


@pytest.mark.parametrize(
    "parameterization,convention",
    [
        ("euler_angles", "ZXY"),
        ("axis_angle", None),
        ("quaternion", None),
        ("rotation_6d", None),
        ("quaternion_adjugate", None),
        ("rotation_10d", None),
        ("se3_log_map", None),
    ],
)
def test_convert_roundtrip(poses, parameterization, convention):
    rot, xyz = poses.convert(parameterization, convention)
    T2 = convert(rot, xyz, parameterization=parameterization, convention=convention)
    np.testing.assert_allclose(poses.matrix, T2.matrix, atol=1e-3)


def test_pytree_jit(poses):
    @jax.jit
    def f(T: RigidTransform):
        return T.inverse().matrix

    np.testing.assert_allclose(f(poses), poses.inverse().matrix, atol=1e-6)


def test_project_onto_SO3_preserves_origin_image():
    A = jnp.eye(3) * 1.3  # scaled identity (not a rotation)
    t = jnp.array([5.0, -2.0, 1.0])
    T = RigidTransform(make_matrix(A, t))
    P = project_onto_SO3(T)
    # The image of the origin under the affine map should be preserved:
    # x=A^-1 t maps... by construction t' = R A^-1 t
    np.testing.assert_allclose(P.R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(P.t, t / 1.3, atol=1e-5)

"""Round-trip and invariance tests for every rotation parameterization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import so3

jax.config.update("jax_enable_x64", False)


def random_rotations(key, n):
    """Uniform random rotations via normalized quaternions."""
    q = jax.random.normal(key, (n, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return so3.quaternion_to_matrix(q)


@pytest.fixture(scope="module")
def rotations():
    return random_rotations(jax.random.PRNGKey(0), 64)


def assert_rotation(R, atol=1e-5):
    eye = np.eye(3)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(eye, R.shape), atol=atol)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=atol)


def test_quaternion_roundtrip(rotations):
    q = so3.matrix_to_quaternion(rotations)
    R2 = so3.quaternion_to_matrix(q)
    np.testing.assert_allclose(rotations, R2, atol=1e-5)
    # canonical sign
    assert (q[:, 0] >= 0).all()


def test_axis_angle_roundtrip(rotations):
    w = so3.matrix_to_axis_angle(rotations)
    R2 = so3.axis_angle_to_matrix(w)
    np.testing.assert_allclose(rotations, R2, atol=1e-5)


def test_axis_angle_small_angle():
    w = jnp.array([[1e-8, -2e-8, 3e-9], [0.0, 0.0, 0.0]])
    R = so3.axis_angle_to_matrix(w)
    assert_rotation(np.asarray(R))
    w2 = so3.matrix_to_axis_angle(R)
    np.testing.assert_allclose(w, w2, atol=1e-6)


@pytest.mark.parametrize("convention", ["ZXY", "XYZ", "ZYX", "YXZ", "XZY", "YZX"])
def test_euler_roundtrip(rotations, convention):
    ang = so3.matrix_to_euler(rotations, convention)
    R2 = so3.euler_to_matrix(ang, convention)
    np.testing.assert_allclose(rotations, R2, atol=1e-4)


def test_euler_degrees():
    ang = jnp.array([[180.0, 30.0, -15.0]])
    R = so3.euler_to_matrix(ang, "ZXY", degrees=True)
    Rr = so3.euler_to_matrix(jnp.deg2rad(ang), "ZXY")
    np.testing.assert_allclose(R, Rr, atol=1e-6)
    back = so3.matrix_to_euler(R, "ZXY", degrees=True)
    np.testing.assert_allclose(((back - ang + 180) % 360) - 180, 0.0, atol=1e-3)


def test_euler_composition_order():
    # Intrinsic ZXY: R = Rz(a) @ Rx(b) @ Ry(c)
    a, b, c = 0.3, -0.5, 1.1
    R = so3.euler_to_matrix(jnp.array([a, b, c]), "ZXY")
    Rz = so3.euler_to_matrix(jnp.array([a, 0, 0]), "ZXY")
    Rx = so3.euler_to_matrix(jnp.array([0, b, 0]), "ZXY")
    Ry = so3.euler_to_matrix(jnp.array([0, 0, c]), "ZXY")
    np.testing.assert_allclose(R, Rz @ Rx @ Ry, atol=1e-6)


def test_rotation_6d_roundtrip(rotations):
    d6 = so3.matrix_to_rotation_6d(rotations)
    R2 = so3.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(rotations, R2, atol=1e-5)
    # arbitrary (unnormalized) 6d still yields valid rotations
    d6_noise = d6 + 0.1 * jax.random.normal(jax.random.PRNGKey(1), d6.shape)
    assert_rotation(np.asarray(so3.rotation_6d_to_matrix(d6_noise)), atol=1e-4)


def test_quaternion_adjugate_roundtrip(rotations):
    v = so3.matrix_to_quaternion_adjugate(rotations)
    assert v.shape[-1] == 10
    R2 = so3.quaternion_adjugate_to_matrix(v)
    np.testing.assert_allclose(rotations, R2, atol=1e-5)


def test_quaternion_adjugate_noise_robust(rotations):
    # A noisy adjugate vector should still decode to a valid rotation
    v = so3.matrix_to_quaternion_adjugate(rotations)
    v = v + 0.05 * jax.random.normal(jax.random.PRNGKey(2), v.shape)
    assert_rotation(np.asarray(so3.quaternion_adjugate_to_matrix(v)), atol=1e-4)


def test_rotation_10d_roundtrip(rotations):
    v = so3.matrix_to_rotation_10d(rotations)
    assert v.shape[-1] == 10
    R2 = so3.rotation_10d_to_matrix(v)
    np.testing.assert_allclose(rotations, R2, atol=1e-4)


def test_project_onto_so3(rotations):
    A = rotations + 0.05 * jax.random.normal(jax.random.PRNGKey(3), rotations.shape)
    R = so3.project_onto_so3(A)
    assert_rotation(np.asarray(R), atol=1e-5)
    # Projection of a rotation is itself
    np.testing.assert_allclose(so3.project_onto_so3(rotations), rotations, atol=1e-5)


def test_conversions_jit_vmap(rotations):
    f = jax.jit(jax.vmap(so3.matrix_to_quaternion))
    np.testing.assert_allclose(f(rotations), so3.matrix_to_quaternion(rotations), atol=1e-6)


def test_gradients_flow():
    def loss(w):
        R = so3.axis_angle_to_matrix(w)
        return jnp.sum(R**2)

    g = jax.grad(loss)(jnp.array([0.2, -0.1, 0.4]))
    assert np.isfinite(np.asarray(g)).all()
    g0 = jax.grad(loss)(jnp.zeros(3))
    assert np.isfinite(np.asarray(g0)).all()

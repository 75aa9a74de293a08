"""Model tests: backbone shapes, pose decoding, parameter counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.models import PoseRegressor, create_backbone, init_pose_regressor


def test_backbone_feature_dim():
    m = create_backbone("resnet18")
    x = jnp.zeros((2, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(params, x)
    assert feats.shape == (2, 512)


def test_unknown_model_name():
    with pytest.raises(ValueError, match="Unknown model_name"):
        create_backbone("convnext_tiny")


@pytest.mark.parametrize("parameterization,n", [
    ("quaternion_adjugate", 10),
    ("euler_angles", 3),
    ("rotation_6d", 6),
])
def test_regressor_heads(parameterization, n):
    model = PoseRegressor(model_name="resnet18", parameterization=parameterization, convention="ZXY")
    params = init_pose_regressor(model, jax.random.PRNGKey(0), 32)
    rot, xyz = model.apply(params, jnp.zeros((3, 1, 32, 32)))
    assert rot.shape == (3, n)
    assert xyz.shape == (3, 3)


def test_regressor_decode_valid_pose():
    model = PoseRegressor(model_name="resnet18")
    params = init_pose_regressor(model, jax.random.PRNGKey(1), 32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 32, 32))
    pose = model.predict_pose(params, x)
    R = np.asarray(pose.R)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_unit_conversion_factor():
    m1 = PoseRegressor(model_name="resnet18", unit_conversion_factor=1.0)
    m1000 = PoseRegressor(model_name="resnet18", unit_conversion_factor=1000.0)
    params = init_pose_regressor(m1, jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 32, 32))
    _, xyz1 = m1.apply(params, x)
    _, xyz1000 = m1000.apply(params, x)
    np.testing.assert_allclose(1000.0 * xyz1, xyz1000, rtol=1e-5)


def test_resnet34_deeper_than_18():
    n18 = sum(x.size for x in jax.tree.leaves(
        create_backbone("resnet18").init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))))
    n34 = sum(x.size for x in jax.tree.leaves(
        create_backbone("resnet34").init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))))
    assert n34 > n18 > 1e6

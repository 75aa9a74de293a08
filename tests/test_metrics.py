"""Metric tests: NCC invariances, Dice on known masks, geodesics, Evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import convert
from xvr_tpu.metrics import (
    Evaluator,
    dice_coefficient,
    dice_loss,
    double_geodesic,
    gradient_ncc,
    local_ncc,
    make_imagesim,
    multiscale_ncc,
    ncc,
    so3_angle,
)
from xvr_tpu.render import Projector, make_test_volume


@pytest.fixture(scope="module")
def imgs():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 1, 32, 32))
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32))
    return x, y


def test_ncc_self_is_one(imgs):
    x, _ = imgs
    np.testing.assert_allclose(ncc(x, x), 1.0, atol=1e-5)
    np.testing.assert_allclose(local_ncc(x, x, 9), 1.0, atol=1e-4)


def test_ncc_affine_invariance(imgs):
    x, y = imgs
    np.testing.assert_allclose(ncc(x, 3.0 * y + 2.0), ncc(x, y), atol=1e-5)
    np.testing.assert_allclose(
        local_ncc(x, 3.0 * y + 2.0, 9), local_ncc(x, y, 9), atol=1e-4
    )


def test_ncc_negation_is_minus_one(imgs):
    x, _ = imgs
    np.testing.assert_allclose(ncc(x, -x), -1.0, atol=1e-5)


def test_ncc_bounds(imgs):
    x, y = imgs
    v = np.asarray(multiscale_ncc(x, y))
    assert ((-1.0001 <= v) & (v <= 1.0001)).all()


def test_multiscale_matches_components(imgs):
    x, y = imgs
    m = multiscale_ncc(x, y, (None, 9), (0.5, 0.5))
    np.testing.assert_allclose(m, 0.5 * ncc(x, y) + 0.5 * local_ncc(x, y, 9), atol=1e-6)


def test_gradient_ncc_self(imgs):
    x, _ = imgs
    np.testing.assert_allclose(gradient_ncc(x, x, 11), 1.0, atol=1e-4)
    # shift sensitivity: shifted image scores lower
    shifted = jnp.roll(x, 3, axis=-1)
    assert float(gradient_ncc(x, shifted, 11).mean()) < 0.9


def test_imagesim_blend(imgs):
    x, y = imgs
    sim = make_imagesim(9, 11, 0.0, 0.5)
    v = sim(x, y)
    expect = 0.5 * multiscale_ncc(x, y, (None, 9), (0.5, 0.5)) + 0.5 * gradient_ncc(x, y, 11, 0.0)
    np.testing.assert_allclose(v, expect, atol=1e-5)


def test_dice_perfect_and_disjoint():
    a = jnp.zeros((1, 3, 8, 8)).at[:, 1, :4].set(1.0).at[:, 2, 4:].set(1.0)
    np.testing.assert_allclose(dice_coefficient(a, a), 1.0, atol=1e-6)
    np.testing.assert_allclose(dice_loss(a, a), 0.0, atol=1e-6)
    b = jnp.zeros_like(a).at[:, 1, 4:].set(1.0).at[:, 2, :4].set(1.0)
    np.testing.assert_allclose(dice_coefficient(a, b), 0.0, atol=1e-6)
    np.testing.assert_allclose(dice_loss(a, b), 1.0, atol=1e-6)


def test_dice_empty_channels_ignored():
    # channel 2 empty in both -> excluded from the mean (nanmean semantics)
    a = jnp.zeros((1, 3, 8, 8)).at[:, 1, :4].set(1.0)
    half = a.at[:, 1, :2].set(0.0)
    loss_full = dice_loss(a, half)
    assert 0.0 < float(loss_full[0]) < 1.0


def test_dice_single_channel_zero_loss():
    a = jnp.ones((2, 1, 4, 4))
    np.testing.assert_allclose(dice_loss(a, a), 0.0)


def test_so3_angle_known():
    R1 = convert(jnp.array([[0.0, 0.0, 0.0]]), None, "euler_angles", "ZXY", degrees=True).R
    R2 = convert(jnp.array([[30.0, 0.0, 0.0]]), None, "euler_angles", "ZXY", degrees=True).R
    np.testing.assert_allclose(np.rad2deg(np.asarray(so3_angle(R1, R2))), 30.0, atol=1e-3)


def test_double_geodesic_components():
    p1 = convert(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[0.0, 0.0, 0.0]]), "euler_angles", "ZXY", degrees=True)
    p2 = convert(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([[3.0, 4.0, 0.0]]), "euler_angles", "ZXY", degrees=True)
    r, t, d = double_geodesic(p1, p2, sdd=1000.0)
    np.testing.assert_allclose(np.asarray(t), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(d), np.sqrt(np.asarray(r) ** 2 + 25.0), atol=1e-4)


def test_evaluator_zero_for_identical_pose():
    vol = make_test_volume(16, spacing=2.0)
    proj = Projector.from_volume(vol, sdd=1000.0, height=64, delx=1.0)
    pose = convert(jnp.array([[5.0, 2.0, -3.0]]), jnp.array([[1.0, 500.0, 2.0]]),
                   "euler_angles", "ZXY", degrees=True)
    fid = jnp.array([[[0.0, 0.0, 0.0], [5.0, -5.0, 10.0]]])
    ev = Evaluator(proj, fid)
    m = np.asarray(ev(pose, pose))
    np.testing.assert_allclose(m, 0.0, atol=1e-2)


def test_evaluator_translation_mtre():
    vol = make_test_volume(16, spacing=2.0)
    proj = Projector.from_volume(vol, sdd=1000.0, height=64, delx=1.0)
    p1 = convert(jnp.zeros((1, 3)), jnp.array([[0.0, 500.0, 0.0]]), "euler_angles", "ZXY", degrees=True)
    p2 = convert(jnp.zeros((1, 3)), jnp.array([[2.0, 500.0, 0.0]]), "euler_angles", "ZXY", degrees=True)
    fid = jnp.array([[[0.0, 0.0, 0.0], [5.0, -5.0, 10.0]]])
    m = np.asarray(Evaluator(proj, fid)(p1, p2))
    np.testing.assert_allclose(m[2], 2.0, atol=1e-4)  # mTRE = |dx|
    assert m[0] > 0 and m[1] > 0 and m[3] > 0


def test_window_mean_matmul_matches_direct():
    """The MXU banded-matmul windowed mean (TPU path) equals the direct
    reduce_window sum, values and gradients, on dense and flat-background
    images alike."""
    import jax
    from xvr_tpu.metrics.ncc import _window_mean_direct, _window_mean_matmul

    rng = np.random.default_rng(5)
    dense = rng.normal(0.5, 0.2, (2, 1, 40, 56)).astype(np.float32)
    flat = np.zeros((2, 1, 40, 56), np.float32)
    flat[:, :, 10:25, 15:30] = rng.uniform(0.5, 1.0, (2, 1, 15, 15))
    for arr in (dense, flat):
        x = jnp.asarray(arr)
        a = _window_mean_direct(x, 9)
        b = _window_mean_matmul(x, 9)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        ga = jax.grad(lambda v: jnp.sum(_window_mean_direct(v, 9) ** 2))(x)
        gb = jax.grad(lambda v: jnp.sum(_window_mean_matmul(v, 9) ** 2))(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-6)

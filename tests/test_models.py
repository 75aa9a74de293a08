"""Model tests: backbone shapes, pose decoding, parameter counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.models import PoseRegressor, create_backbone, init_pose_regressor


def test_backbone_feature_dim():
    m = create_backbone("resnet18")
    x = jnp.zeros((2, 32, 32, 1))
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
    rot, xyz = model.apply(params, jnp.zeros((2, 1, 32, 32)))
    assert rot.shape == (2, n)
    assert xyz.shape == (2, 3)


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


@pytest.mark.slow
def test_imagenet_backbone_grafting(tmp_path):
    """A torchvision-format resnet18 state_dict grafts into the flax params:
    conv kernels transposed OIHW->HWIO, stem summed RGB->1ch, BN stats folded
    into the GroupNorm affine; the model still runs."""
    import numpy as np
    import torch

    from xvr_tpu.models import PoseRegressor, init_pose_regressor, load_imagenet_backbone

    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    def bn(c, prefix, sd):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.abs(t(c)) + 0.5

    sd = {"conv1.weight": t(64, 3, 7, 7)}
    bn(64, "bn1", sd)
    chans = [64, 128, 256, 512]
    for i, (c, size) in enumerate(zip(chans, [2, 2, 2, 2])):
        cin = chans[i - 1] if i else 64
        for j in range(size):
            p = f"layer{i + 1}.{j}"
            first_in = cin if j == 0 else c
            sd[f"{p}.conv1.weight"] = t(c, first_in, 3, 3)
            bn(c, f"{p}.bn1", sd)
            sd[f"{p}.conv2.weight"] = t(c, c, 3, 3)
            bn(c, f"{p}.bn2", sd)
            if j == 0 and i > 0:
                sd[f"{p}.downsample.0.weight"] = t(c, cin, 1, 1)
                bn(c, f"{p}.downsample.1", sd)
    path = tmp_path / "resnet18.pth"
    torch.save(sd, path)

    model = PoseRegressor(model_name="resnet18")
    params = init_pose_regressor(model, jax.random.PRNGKey(0), 32)
    loaded_params, ok = load_imagenet_backbone(params, "resnet18", weights_path=path)
    assert ok
    net = loaded_params["params"]["ResNet_0"]
    # stem: summed RGB, OIHW->HWIO
    expect = np.asarray(sd["conv1.weight"]).sum(1, keepdims=True).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(net["Conv_0"]["kernel"]), expect, rtol=1e-6)
    # folded BN -> GN affine on the stem
    w, b = np.asarray(sd["bn1.weight"]), np.asarray(sd["bn1.bias"])
    rm, rv = np.asarray(sd["bn1.running_mean"]), np.asarray(sd["bn1.running_var"])
    scale = w / np.sqrt(rv + 1e-5)
    gn = net["_AdaptiveGroupNorm_0"]["GroupNorm_0"]
    np.testing.assert_allclose(np.asarray(gn["scale"]), scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gn["bias"]), b - rm * scale, rtol=1e-5)
    # downsample conv of layer2.0 landed in BasicBlock_2/Conv_2
    ds = np.asarray(sd["layer2.0.downsample.0.weight"]).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(net["BasicBlock_2"]["Conv_2"]["kernel"]), ds, rtol=1e-6)
    # grafted model still runs
    rot, xyz = model.apply(loaded_params, jnp.zeros((1, 1, 32, 32)))
    assert np.isfinite(np.asarray(rot)).all() and np.isfinite(np.asarray(xyz)).all()
    # heads untouched
    np.testing.assert_array_equal(
        np.asarray(params["params"]["Dense_0"]["kernel"]),
        np.asarray(loaded_params["params"]["Dense_0"]["kernel"]))
    # missing file -> unchanged params, ok=False
    same, ok2 = load_imagenet_backbone(params, "resnet18", weights_path=tmp_path / "nope.pth")
    assert not ok2


def test_construct_antipode_involution_and_semantics():
    """Antipodal pose (PA/AP flip ambiguity, reference model/inference.py:52-55):
    alpha -> pi - ... i.e. negate alpha/beta and add 180 deg to alpha; gamma
    and the translation stay. Applying it twice returns the original pose."""
    import jax.numpy as jnp
    import numpy as np

    from xvr_tpu.geometry import convert
    from xvr_tpu.models.inference import construct_antipode

    rot = jnp.asarray([[np.deg2rad(170.0), np.deg2rad(-8.0), np.deg2rad(5.0)]])
    xyz = jnp.asarray([[4.0, 300.0, -6.0]])
    pose = convert(rot, xyz, "euler_angles", "ZXY")
    anti = construct_antipode(pose)
    a_rot, a_xyz = (np.asarray(x)[0] for x in anti.convert("euler_angles", "ZXY"))
    # wrap-insensitive comparison through the rotation matrices
    expect = convert(
        jnp.asarray([[np.pi - rot[0, 0], -rot[0, 1], rot[0, 2]]]), xyz,
        "euler_angles", "ZXY",
    )
    np.testing.assert_allclose(
        np.asarray(anti.matrix), np.asarray(expect.matrix), atol=1e-5
    )
    again = construct_antipode(anti)
    np.testing.assert_allclose(
        np.asarray(again.matrix), np.asarray(pose.matrix), atol=1e-5
    )


def test_correct_pose_with_itk_warp(tmp_path):
    """correct_pose composes the predicted pose with the ITK/ANTs rigid warp
    (reference model/inference.py:43-49); warp=None is the identity. With an
    identity direction matrix and a centered volume, a pure-translation ITK
    transform appears (LPS->RAS-conjugated) in the composed matrix."""
    import jax.numpy as jnp
    import numpy as np

    from xvr_tpu.geometry import convert
    from xvr_tpu.io import save_nifti
    from xvr_tpu.models.inference import correct_pose

    vol = tmp_path / "ct.nii.gz"
    n, sp = 8, 2.0
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -(n - 1) / 2.0 * sp
    save_nifti(vol, np.zeros((n, n, n), np.float32), aff)

    itk = tmp_path / "warp.txt"
    itk.write_text(
        "#Insight Transform File V1.0\n#Transform 0\n"
        "Transform: AffineTransform_double_3_3\n"
        "Parameters: 1 0 0 0 1 0 0 0 1 5 -3 2\n"
        "FixedParameters: 0 0 0\n"
    )

    pose = convert(
        jnp.asarray([[np.pi, 0.05, -0.02]]), jnp.asarray([[3.0, 250.0, -4.0]]),
        "euler_angles", "ZXY",
    )
    assert correct_pose(pose, None, vol, False) is pose

    out = correct_pose(pose, itk, vol, False)
    M_pose = np.asarray(pose.matrix)[0]
    M_out = np.asarray(out.matrix)[0]
    # a.compose(b) applies a then b: matrix = b @ a
    T = M_out @ np.linalg.inv(M_pose)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-5)
    # ANTs translations are LPS; RAS flips x and y
    np.testing.assert_allclose(T[:3, 3], [-5.0, 3.0, 2.0], atol=1e-4)

    inv = correct_pose(pose, itk, vol, True)
    Ti = np.asarray(inv.matrix)[0] @ np.linalg.inv(M_pose)
    np.testing.assert_allclose(Ti[:3, 3], [5.0, -3.0, -2.0], atol=1e-4)


def test_resample_matches_direct_render():
    """Intrinsics reprojection (reference diffdrr.utils.resample via
    model/inference.py:26-40): along matched ray angles the line integral is
    IDENTICAL, so resampling a DRR rendered at one (sdd, delx) to another
    must reproduce a direct render at the target intrinsics (away from the
    border where the source detector has no data)."""
    import jax.numpy as jnp
    import numpy as np

    from xvr_tpu.geometry import convert
    from xvr_tpu.models.inference import resample
    from xvr_tpu.render import Projector, make_test_volume

    vol = make_test_volume(32, spacing=3.0, kind="sphere")
    pose = convert(
        jnp.asarray([[182.0, -2.0, 1.0]]), jnp.asarray([[2.0, 400.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    H = 64
    pa = Projector.from_volume(vol, sdd=700.0, height=H, delx=2.4)
    pb = Projector.from_volume(vol, sdd=1000.0, height=H, delx=2.0)
    img_a = pa(pose)
    img_b = np.asarray(pb(pose))
    out = np.asarray(resample(img_a, 700.0, 2.4, 0.0, 0.0, 1000.0, 2.0))
    # compare the interior (border pixels may fall off detector A)
    s = 6
    a, b = out[..., s:-s, s:-s], img_b[..., s:-s, s:-s]
    scale = np.abs(b).max()
    assert np.abs(a - b).max() / scale < 0.03
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999

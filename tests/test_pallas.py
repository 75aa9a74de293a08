"""Pallas kernel tests (interpret mode on CPU) against the XLA golden models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import Detector, convert, so3
from xvr_tpu.geometry.se3 import RigidTransform, make_matrix
from xvr_tpu.render import make_test_volume
from xvr_tpu.render.pallas import (
    _choose_permutation,
    _pack_pairs,
    raymarch_trilinear_pallas,
)
from xvr_tpu.render.xla import raymarch_siddon, raymarch_trilinear


def world_pose(rot, xyz, degrees=False):
    """[R | t] with WORLD-frame translation. Kernel tests pin exact ray
    geometry with this, independent of the framework's camera-frame xyz
    convention in ``convert`` (geometry/se3.py)."""
    R = so3.euler_to_matrix(jnp.asarray(rot, jnp.float32), "ZXY", degrees=degrees)
    return RigidTransform(make_matrix(R, jnp.asarray(xyz, jnp.float32)))


def pose_at(rot_deg, xyz):
    return world_pose(
        jnp.asarray([rot_deg], jnp.float32), jnp.asarray([xyz], jnp.float32),
        degrees=True,
    )


def cam_pose(rot_deg, xyz):
    """Framework-convention pose (camera-frame xyz) for Projector-level
    tests: alpha ~ 180 with ty > 0 orbits and views the origin."""
    return convert(
        jnp.asarray([rot_deg], jnp.float32), jnp.asarray([xyz], jnp.float32),
        "euler_angles", "ZXY", degrees=True,
    )


def test_pack_pairs_roundtrip():
    vol = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4) / 64.0
    packed = _pack_pairs(vol)
    assert packed.shape == (4 * 4 * 1, 128)
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF) << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = np.asarray(lo).reshape(4, 4, 128)[..., :4]
    hi = np.asarray(hi).reshape(4, 4, 128)[..., :4]
    np.testing.assert_allclose(lo, np.asarray(vol), atol=1e-2)
    # hi is the +1 lane neighbor (clamped at the end)
    np.testing.assert_allclose(hi[..., :3], np.asarray(vol)[..., 1:], atol=1e-2)


def test_single_ray_exact():
    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    src = jnp.array([[[0.0, 200.0, 0.0]]])
    tgt = jnp.array([[[0.0, -200.0, 0.0]]])
    out = raymarch_trilinear_pallas(vol.data, vol.affine_inverse, src, tgt, window=8)
    np.testing.assert_allclose(float(out[0, 0]), 31.0, rtol=1e-3)


@pytest.mark.parametrize("kind", ["gradient", "sphere", "random"])
def test_matches_highres_trilinear(kind):
    vol = make_test_volume(32, spacing=2.0, kind=kind)
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = pose_at([5.0, -3.0, 2.0], [3.0, 200.0, -4.0])
    src, tgt = det.rays(pose)
    ref = np.asarray(raymarch_trilinear(vol.data, vol.affine_inverse, src, tgt, n_samples=2048))
    pal = np.asarray(raymarch_trilinear_pallas(vol.data, vol.affine_inverse, src, tgt, window=16))
    err = np.abs(pal - ref).max() / max(ref.max(), 1e-9)
    assert err < 0.02, f"{kind}: rel err {err}"


def test_batched_poses():
    vol = make_test_volume(24, spacing=2.0, kind="sphere")
    det = Detector(sdd=400.0, height=8, width=8, delx=6.0, dely=6.0)
    rots = jnp.asarray([[0.0, 0, 0], [4.0, -3.0, 2.0], [-6.0, 5.0, 0.0]], jnp.float32)
    xyzs = jnp.tile(jnp.asarray([[0.0, 200.0, 0.0]], jnp.float32), (3, 1))
    pose = world_pose(rots, xyzs, degrees=True)
    src, tgt = det.rays(pose)
    # compare against the XLA renderer with the SAME interpolation model
    ref = np.asarray(raymarch_trilinear(vol.data, vol.affine_inverse, src, tgt, n_samples=1024))
    pal = np.asarray(raymarch_trilinear_pallas(vol.data, vol.affine_inverse, src, tgt, window=16))
    err = np.abs(pal - ref).max() / ref.max()
    assert err < 0.03, err


def test_permutation_choice():
    assert _choose_permutation(np.asarray([0.1, -0.9, 0.2]))[0] == 1
    assert _choose_permutation(np.asarray([0.9, 0.1, 0.2]))[0] == 0
    assert _choose_permutation(np.asarray([0.0, 0.1, -0.8]))[0] == 2


def test_channel_rendering_matches_xla():
    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    # two labeled regions split along the x axis
    idx = np.arange(32)
    X = np.broadcast_to(idx[:, None, None], (32, 32, 32))
    mask = jnp.asarray(np.where(X < 12, 1, np.where(X >= 20, 3, 0)).astype(np.int32))
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = pose_at([3.0, -2.0, 1.0], [0.0, 200.0, 0.0])
    src, tgt = det.rays(pose)
    ref = np.asarray(raymarch_trilinear(
        vol.data, vol.affine_inverse, src, tgt, n_samples=2048,
        mask=mask, labels=(1, 3),
    ))
    out = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, mask=mask, labels=(1, 3), window=32
    ))
    assert out.shape == (1, 3, 256)
    # channel totals agree with the golden renderer and sum to the plain DRR
    total_ref = np.asarray(raymarch_trilinear(
        vol.data, vol.affine_inverse, src, tgt, n_samples=2048))
    np.testing.assert_allclose(out.sum(axis=1), total_ref, rtol=0.03, atol=0.05)
    for c in range(3):
        err = np.abs(out[:, c] - ref[:, c]).max() / max(ref.max(), 1e-9)
        assert err < 0.05, (c, err)


@pytest.mark.slow
def test_channel_rendering_gradients():
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    mask = jnp.asarray((np.asarray(vol.data) > 0.3).astype(np.int32))
    det = Detector(sdd=400.0, height=8, width=8, delx=4.0, dely=4.0)

    def loss(ty):
        pose = convert(jnp.zeros((1, 3)), jnp.stack([jnp.zeros(()), ty, jnp.zeros(())])[None],
                       "euler_angles", "ZXY")
        src, tgt = det.rays(pose)
        ch = raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt,
            mask=mask, labels=(1,), window=16, perm=(1, 0, 2),
        )
        return jnp.sum(jnp.sum(ch, axis=1) ** 2)  # consumes channels via sum

    g = jax.grad(loss)(jnp.asarray(200.0))
    eps = 1e-2
    fd = float((loss(jnp.asarray(200.0 + eps)) - loss(jnp.asarray(200.0 - eps))) / (2 * eps))
    assert abs(float(g) - fd) / (abs(fd) + 1e-3) < 0.02, (float(g), fd)


@pytest.mark.slow
def test_custom_vjp_matches_finite_differences():
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    det = Detector(sdd=400.0, height=8, width=8, delx=4.0, dely=4.0)
    perm = (1, 0, 2)  # beam along -y

    def loss(params):
        alpha, ty, tz = params
        rot = jnp.stack([alpha, jnp.zeros(()), jnp.zeros(())])[None]
        xyz = jnp.stack([jnp.zeros(()), ty, tz])[None]
        pose = world_pose(rot, xyz)
        src, tgt = det.rays(pose)
        img = raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=16, perm=perm
        )
        return jnp.sum(img**2)

    p = jnp.array([0.02, 200.0, 1.5])
    g = np.asarray(jax.grad(loss)(p))
    eps = [1e-4, 1e-2, 1e-2]
    for k in range(3):
        e = jnp.zeros(3).at[k].set(eps[k])
        fd = float((loss(p + e) - loss(p - e)) / (2 * eps[k]))
        assert abs(g[k] - fd) / (abs(fd) + 1e-3) < 0.02, (k, g[k], fd)


def test_pallas_inside_jit_with_static_perm():
    vol = make_test_volume(16, spacing=2.0, kind="sphere")
    det = Detector(sdd=400.0, height=8, width=8, delx=4.0, dely=4.0)

    @jax.jit
    def render(ty):
        pose = convert(jnp.zeros((1, 3)), jnp.stack([jnp.zeros(()), ty, jnp.zeros(())])[None],
                       "euler_angles", "ZXY")
        src, tgt = det.rays(pose)
        return raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=8, perm=(1, 0, 2)
        )

    out = render(jnp.asarray(200.0))
    assert np.isfinite(np.asarray(out)).all()


def test_projector_with_pallas():
    from xvr_tpu.render import Projector

    # smooth phantom: quadrature differences on discontinuities don't count
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    proj = Projector.from_volume(vol, sdd=400.0, height=8, delx=4.0)
    pose = cam_pose([180.0, 0.0, 0.0], [0.0, 200.0, 0.0])
    ref = np.asarray(proj(pose))
    # window must cover the per-tile transverse span (here the whole 16-voxel
    # extent: the 8-col detector footprint spans ~9 voxels)
    pp = proj.with_pallas(pose, window=16)
    assert pp.renderer == "trilinear_pallas"
    assert pp.pallas_perm[0] == 1  # beam along -y -> march axis y
    out = np.asarray(pp(pose))
    assert np.abs(out - ref).max() / ref.max() < 0.05


def test_measured_window_span_guards_clipping():
    from xvr_tpu.render.pallas import measured_window_span, pack_density

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    # a strong in-plane roll leaks the detector-column direction into the
    # window axis -> wide per-tile spans
    pose = pose_at([8.0, 0.0, 25.0], [0.0, 200.0, 0.0])
    src, tgt = det.rays(pose)
    perm = (1, 0, 2)
    _, vol_shape = pack_density(vol.data, perm)
    span = measured_window_span(
        np.asarray(src), np.asarray(tgt), np.asarray(vol.affine_inverse),
        perm, (16, 16), vol_shape,
    )
    assert span > 10.0  # geometry chosen so a window of 8 must clip
    w_ok = int(-(-span // 8) * 8)

    ref = np.asarray(raymarch_trilinear(vol.data, vol.affine_inverse, src, tgt, n_samples=1024))
    ok = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=w_ok, perm=perm))
    assert np.abs(ok - ref).max() / ref.max() < 0.03

    clipped = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=8, perm=perm))
    assert clipped.mean() < 0.98 * ref.mean()  # the failure mode the guard exists for


def test_projector_auto_window_and_steepness_fallback():
    from xvr_tpu.render import Projector

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    proj = Projector.from_volume(vol, sdd=400.0, height=16, delx=4.0)
    pose = cam_pose([180.0 + 10.0, 0.0, 20.0], [0.0, 200.0, 0.0])

    pp = proj.with_pallas(pose)  # window=None -> exact measurement
    assert pp.renderer == "trilinear_pallas"
    assert pp.pallas_window >= 8
    out = np.asarray(pp(pose))
    # the measured window must capture EVERY contribution a full-width
    # window would (corner-graze quadrature differences vs the XLA model are
    # a separate, window-independent property)
    full = np.asarray(pp.replace(pallas_window=32)(pose))
    np.testing.assert_array_equal(out, full)
    ref = np.asarray(proj.replace(n_samples=2048)(pose))  # high-res golden
    assert out.mean() > 0.9 * ref.mean()

    # beam at 45 deg between two volume axes plus a wide detector FOV: corner
    # rays exceed the kernel's regime, with_pallas must keep the XLA renderer
    wide = Projector.from_volume(vol, sdd=400.0, height=16, delx=12.0)
    diag = cam_pose([180.0 + 45.0, 0.0, 0.0], [0.0, 200.0, 0.0])
    kept = wide.with_pallas(diag)
    assert kept.renderer == "trilinear"


@pytest.mark.slow
def test_remap_is_exact_permutation():
    # sorted-ray layout + unsort must reproduce the detector layout EXACTLY
    # (same kernel math per ray, different grouping)
    vol = make_test_volume(32, spacing=2.0, kind="random")
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = pose_at([8.0, -4.0, 20.0], [3.0, 200.0, -4.0])
    src, tgt = det.rays(pose)
    base = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=32, perm=(1, 0, 2)))
    remapped = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=32, perm=(1, 0, 2), remap=True))
    np.testing.assert_allclose(remapped, base, rtol=1e-6, atol=1e-5)

    from xvr_tpu.render.pallas import raymarch_siddon_pallas

    base_s = np.asarray(raymarch_siddon_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=32, perm=(1, 0, 2)))
    remap_s = np.asarray(raymarch_siddon_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=32, perm=(1, 0, 2), remap=True))
    np.testing.assert_allclose(remap_s, base_s, rtol=1e-6, atol=1e-5)


def test_remap_shrinks_window_on_large_detectors():
    # bench-scale geometry, measurement only (no rendering): under in-plane
    # roll the sorted layout must need a much smaller window than detector
    # tiling. Small detectors (~1 tile) gain nothing — tuned_for() picks.
    from xvr_tpu.render.pallas import measured_window_span

    N = 256
    aff = np.eye(4, dtype=np.float32) * 1.5
    aff[3, 3] = 1.0
    aff[:3, 3] = -(N - 1) / 2.0 * 1.5
    affinv = np.linalg.inv(aff)
    det = Detector(sdd=1020.0, height=256, width=256, delx=2.0, dely=2.0)
    pose = pose_at([10.0, -5.0, 12.0], [0.0, 650.0, 0.0])
    src, tgt = det.rays(pose)
    # march=y (beam), lane=x (detector columns), window=z (rows)
    perm = (1, 2, 0)
    args = (np.asarray(src), np.asarray(tgt), affinv, perm, (256, 256), (N, N, N))
    span_det = measured_window_span(*args)
    span_remap = measured_window_span(*args, remap=True)
    assert span_remap < 0.6 * span_det, (span_remap, span_det)


@pytest.mark.slow
def test_remap_measured_window_stays_unclipped():
    from xvr_tpu.render.pallas import measured_window_span, pack_density

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = pose_at([8.0, 0.0, 25.0], [0.0, 200.0, 0.0])  # strong roll
    src, tgt = det.rays(pose)
    perm = (1, 0, 2)
    _, vol_shape = pack_density(vol.data, perm)
    span_remap = measured_window_span(
        np.asarray(src), np.asarray(tgt), np.asarray(vol.affine_inverse),
        perm, (16, 16), vol_shape, remap=True,
    )
    w = int(-(-span_remap // 8) * 8)
    full = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=32, perm=perm, remap=True))
    tight = np.asarray(raymarch_trilinear_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=w, perm=perm, remap=True))
    np.testing.assert_array_equal(tight, full)


@pytest.mark.slow
def test_remap_gradients_match_finite_differences():
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    det = Detector(sdd=400.0, height=8, width=8, delx=4.0, dely=4.0)

    def loss(params):
        alpha, ty, tz = params
        rot = jnp.stack([alpha, jnp.zeros(()), jnp.zeros(())])[None]
        xyz = jnp.stack([jnp.zeros(()), ty, tz])[None]
        pose = world_pose(rot, xyz)
        src, tgt = det.rays(pose)
        img = raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=16, perm=(1, 0, 2),
            remap=True,
        )
        return jnp.sum(img**2)

    p = jnp.array([0.02, 200.0, 1.5])
    g = np.asarray(jax.grad(loss)(p))
    eps = [1e-4, 1e-2, 1e-2]
    for k in range(3):
        e = jnp.zeros(3).at[k].set(eps[k])
        fd = float((loss(p + e) - loss(p - e)) / (2 * eps[k]))
        assert abs(g[k] - fd) / (abs(fd) + 1e-3) < 0.02, (k, g[k], fd)


def test_packed_table_bytes():
    from xvr_tpu.render.pallas import packed_table_bytes

    assert packed_table_bytes((256, 256, 256)) == 256 * 256 * 2 * 128 * 4
    assert packed_table_bytes((512, 512, 512)) == 512 * 512 * 4 * 128 * 4
    assert packed_table_bytes((512, 512, 512)) > 100 * 1024 * 1024


@pytest.mark.slow
def test_streaming_matches_resident():
    # the HBM-streaming kernel (slab chunks as outermost grid dim) must
    # reproduce the VMEM-resident kernel exactly, including with the remap.
    # Chunk size forced small so the march really spans multiple chunks
    # (accumulation across output-block revisits is the thing under test).
    from unittest import mock

    from xvr_tpu.render import pallas as pallas_mod

    vol = make_test_volume(32, spacing=2.0, kind="random")
    det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
    pose = pose_at([8.0, -4.0, 15.0], [3.0, 200.0, -4.0])
    src, tgt = det.rays(pose)
    patcher = mock.patch.object(pallas_mod, "_stream_chunk", return_value=8)
    patcher.start()
    for remap in (False, True):
        base = np.asarray(raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=24, perm=(1, 0, 2),
            remap=remap, stream=False))
        streamed = np.asarray(raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=24, perm=(1, 0, 2),
            remap=remap, stream=True))
        np.testing.assert_allclose(streamed, base, rtol=1e-6, atol=1e-5)

    from xvr_tpu.render.pallas import raymarch_siddon_pallas

    base = np.asarray(raymarch_siddon_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=24, perm=(1, 0, 2)))
    streamed = np.asarray(raymarch_siddon_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=24, perm=(1, 0, 2),
        stream=True))
    patcher.stop()
    np.testing.assert_allclose(streamed, base, rtol=1e-6, atol=1e-5)


@pytest.mark.slow
def test_streaming_gradients_match_finite_differences():
    vol = make_test_volume(16, spacing=2.0, kind="gradient")
    det = Detector(sdd=400.0, height=8, width=8, delx=4.0, dely=4.0)

    def loss(params):
        alpha, ty, tz = params
        rot = jnp.stack([alpha, jnp.zeros(()), jnp.zeros(())])[None]
        xyz = jnp.stack([jnp.zeros(()), ty, tz])[None]
        pose = world_pose(rot, xyz)
        src, tgt = det.rays(pose)
        img = raymarch_trilinear_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=16, perm=(1, 0, 2),
            stream=True,
        )
        return jnp.sum(img**2)

    p = jnp.array([0.02, 200.0, 1.5])
    g = np.asarray(jax.grad(loss)(p))
    eps = [1e-4, 1e-2, 1e-2]
    for k in range(3):
        e = jnp.zeros(3).at[k].set(eps[k])
        fd = float((loss(p + e) - loss(p - e)) / (2 * eps[k]))
        assert abs(g[k] - fd) / (abs(fd) + 1e-3) < 0.02, (k, g[k], fd)


def test_siddon_pallas_matches_xla_exactly():
    from xvr_tpu.render.pallas import raymarch_siddon_pallas

    # piecewise-constant model: the Pallas Siddon must match the XLA DDA to
    # bf16 volume quantization for rays within 45 deg of the march axis
    for kind in ["gradient", "sphere", "random"]:
        vol = make_test_volume(32, spacing=2.0, kind=kind)
        det = Detector(sdd=400.0, height=16, width=16, delx=4.0, dely=4.0)
        pose = pose_at([6.0, -4.0, 3.0], [3.0, 200.0, -5.0])
        src, tgt = det.rays(pose)
        ref = np.asarray(raymarch_siddon(vol.data, vol.affine_inverse, src, tgt))
        pal = np.asarray(raymarch_siddon_pallas(
            vol.data, vol.affine_inverse, src, tgt, window=32, perm=(1, 0, 2)
        ))
        err = np.abs(pal - ref).max() / max(ref.max(), 1e-9)
        assert err < 0.01, (kind, err)


def test_siddon_pallas_single_ray_exact():
    from xvr_tpu.render.pallas import raymarch_siddon_pallas

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    src = jnp.array([[[0.0, 200.0, 0.0]]])
    tgt = jnp.array([[[0.0, -200.0, 0.0]]])
    ref = float(np.asarray(raymarch_siddon(vol.data, vol.affine_inverse, src, tgt))[0, 0])
    pal = float(np.asarray(raymarch_siddon_pallas(
        vol.data, vol.affine_inverse, src, tgt, window=8, perm=(1, 0, 2)))[0, 0])
    assert abs(pal - ref) / ref < 0.005, (pal, ref)


@pytest.mark.slow
def test_lane_extent_beyond_256():
    """Lane-axis gathers must reach past 2x128 lanes (512-wide CTs).

    Regression: the kernels used a two-half select (in_lo/idx_hi) that
    silently wrapped lane indices >= 256 back into half 1, corrupting renders
    of volumes whose lane-axis extent exceeds 256 voxels."""
    from xvr_tpu.render.pallas import raymarch_siddon_pallas, raymarch_trilinear_pallas

    nx, ny, nz = 300, 20, 32  # lane axis (x, detector columns) > 256
    X = np.linspace(-1, 1, nx)[:, None, None]
    Z = np.linspace(-1, 1, nz)[None, None, :]
    data = np.broadcast_to(
        np.exp(-(X**2 + Z**2) * 3.0), (nx, ny, nz)
    ).astype(np.float32)
    sp = 2.0
    aff = np.eye(4, dtype=np.float32) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = [-(nx - 1) / 2 * sp, -(ny - 1) / 2 * sp, -(nz - 1) / 2 * sp]
    density = jnp.asarray(data)
    affinv = jnp.asarray(np.linalg.inv(aff))
    det = Detector(sdd=1500.0, height=32, width=64, delx=12.0, dely=12.0)
    pose = pose_at([1.0, 0.5, 0.5], [0.0, 700.0, 0.0])
    src, tgt = det.rays(pose)
    perm = (1, 2, 0)  # march y, window z, lane x (extent 300)

    ref = np.asarray(raymarch_trilinear(density, affinv, src, tgt, n_samples=1024))
    out = np.asarray(raymarch_trilinear_pallas(
        density, affinv, src, tgt, det_shape=(32, 64), window=24, perm=perm
    ))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.03

    refs = np.asarray(raymarch_siddon(density, affinv, src, tgt))
    outs = np.asarray(raymarch_siddon_pallas(
        density, affinv, src, tgt, det_shape=(32, 64), window=32, perm=perm
    ))
    assert np.abs(outs - refs).max() / np.abs(refs).max() < 0.01

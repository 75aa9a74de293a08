"""Shear-warp MXU renderer: golden accuracy + gradient consistency.

The shear-warp path (xvr_tpu/render/shearwarp.py) reformulates the trilinear
DRR as per-slab separable band matmuls in ray-slope space plus a final
bilinear warp. These tests pin it against the XLA golden renderer (the same
contract the slab Pallas kernel is tested against in test_pallas.py) and
check that the fast differentiable path's slab-kernel VJP matches XLA
gradients in direction and magnitude.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import Detector, convert
from xvr_tpu.render import xla
from xvr_tpu.render.pallas import choose_permutation_for_pose
from xvr_tpu.render.shearwarp import (
    default_grid_shape,
    measured_warp_window,
    prepare_shearwarp,
    raymarch_siddon_fast,
    raymarch_siddon_shearwarp,
    raymarch_trilinear_fast,
    raymarch_trilinear_shearwarp,
)

N = 48
H = 64


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    g = np.linspace(-1, 1, N)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    blob = np.exp(-((X * 1.2) ** 2 + (Y * 0.8) ** 2 + (Z * 1.1) ** 2) * 6.0)
    # air-like (near-zero) density at the volume boundary: the regime real
    # CTs live in, and where the shear-warp's slope-space resample is accurate
    # (a hard-edged solid cube would smear its silhouette by ~1 pixel)
    hu = (blob * 800.0 + blob * rng.normal(0.0, 40.0, blob.shape)).astype(np.float32)
    spacing = 2.0
    aff = np.eye(4, dtype=np.float32) * spacing
    aff[3, 3] = 1.0
    aff[:3, 3] = -(N - 1) / 2.0 * spacing
    density = jnp.asarray(hu / 1000.0)
    affinv = jnp.asarray(np.linalg.inv(aff))
    det = Detector(sdd=1020.0, height=H, width=H, delx=1.5, dely=1.5)
    rot = jnp.asarray([[2.0, -1.5, 2.5], [0.0, 0.0, 0.0], [-2.5, 1.0, -1.5]])
    xyz = jnp.asarray([[5.0, 600.0, -8.0], [0.0, 650.0, 0.0], [-6.0, 550.0, 4.0]])
    pose = convert(rot, xyz, "euler_angles", "ZXY", degrees=True)
    src, tgt = det.rays(pose)
    perm = choose_permutation_for_pose(np.eye(3), np.asarray(affinv))
    ref = np.asarray(xla.raymarch_trilinear(density, affinv, src, tgt, n_samples=512))
    return density, affinv, det, src, tgt, perm, ref


def test_warp_window_host_matches_device(scene):
    """The pure-NumPy window-span twin (bench setup path) must agree with the
    device measurement in both ray layouts."""
    density, affinv, det, src, tgt, perm, ref = scene
    args = (np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H))
    for remap in (False, True):
        w_dev = measured_warp_window(*args, remap=remap)
        w_host = measured_warp_window(*args, remap=remap, host=True)
        assert w_host == w_dev, (remap, w_host, w_dev)


def test_forward_matches_golden(scene):
    density, affinv, det, src, tgt, perm, ref = scene
    ww = measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H)
    )
    out = np.asarray(
        raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, perm=perm, warp_window=ww
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 0.02
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.9999


def test_prepared_volume_hoisting(scene):
    density, affinv, det, src, tgt, perm, ref = scene
    prepared = prepare_shearwarp(density, perm)
    a = raymarch_trilinear_shearwarp(
        density, affinv, src, tgt, perm=perm, prepared=prepared, warp_window=32
    )
    b = raymarch_trilinear_shearwarp(
        density, affinv, src, tgt, perm=perm, warp_window=32
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)


@pytest.mark.slow
def test_fast_path_gradient_matches_xla(scene):
    density, affinv, det, src, tgt, perm, ref = scene
    ww = measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H)
    )
    ref0 = jnp.asarray(ref[:1])

    def loss(render):
        def f(r6):
            p = convert(r6[None, :3], r6[None, 3:], "euler_angles", "ZXY", degrees=True)
            s, t = det.rays(p)
            return jnp.sum((render(s, t) - ref0) ** 2)

        return f

    fast = loss(
        lambda s, t: raymarch_trilinear_fast(
            density, affinv, s, t, perm=perm, warp_window=ww, slab_window=32
        )
    )
    gold = loss(
        lambda s, t: xla.raymarch_trilinear(density, affinv, s, t, n_samples=512)
    )
    r0 = jnp.asarray([2.2, -1.3, 2.7, 4.0, 610.0, -7.0])
    lf, gf = jax.value_and_grad(fast)(r0)
    lx, gx = jax.value_and_grad(gold)(r0)
    gf, gx = np.asarray(gf), np.asarray(gx)
    assert abs(float(lf) - float(lx)) / float(lx) < 0.01
    cos = gf @ gx / (np.linalg.norm(gf) * np.linalg.norm(gx))
    assert cos > 0.999
    assert abs(np.linalg.norm(gf) / np.linalg.norm(gx) - 1.0) < 0.05


def test_point_source_required(scene):
    density, affinv, det, src, tgt, perm, ref = scene
    with pytest.raises(ValueError, match="point source"):
        raymarch_trilinear_shearwarp(
            density, affinv, jnp.broadcast_to(src, tgt.shape), tgt, perm=perm
        )


@pytest.mark.slow
def test_projector_with_shearwarp():
    from xvr_tpu.render import Projector, make_test_volume

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    proj = Projector.from_volume(vol, sdd=400.0, height=16, delx=3.0)
    rot = jnp.asarray([[182.0, -1.5, 1.0]])
    xyz = jnp.asarray([[2.0, 200.0, -3.0]])
    pose = convert(rot, xyz, "euler_angles", "ZXY", degrees=True)
    ref = np.asarray(proj(pose))
    for differentiable, name in ((False, "trilinear_shearwarp"), (True, "trilinear_fast")):
        pp = proj.with_shearwarp(pose, differentiable=differentiable)
        assert pp.renderer == name
        out = np.asarray(pp(pose))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.05

    # fast path is differentiable end-to-end through the projector
    pp = proj.with_shearwarp(pose)

    def loss(xyz_):
        p = convert(rot, xyz_, "euler_angles", "ZXY", degrees=True)
        return jnp.sum(pp(p) ** 2)

    g = np.asarray(jax.grad(loss)(xyz))
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_siddon_forward_matches_golden(scene):
    """Siddon-flavored shear-warp (narrow trapezoid profile) vs exact XLA
    Siddon: identical up to the quarter-voxel transverse smoothing."""
    density, affinv, det, src, tgt, perm, ref = scene
    ww = measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H)
    )
    gold = np.asarray(xla.raymarch_siddon(density, affinv, src, tgt))
    out = np.asarray(
        raymarch_siddon_shearwarp(density, affinv, src, tgt, perm=perm, warp_window=ww)
    )
    scale = np.abs(gold).max()
    # the scene carries per-voxel noise, so the eps-wide transverse smoothing
    # shows up directly against hard nearest-neighbor: ~4% linf, corr 0.9999
    assert np.abs(out - gold).max() / scale < 0.06
    assert np.corrcoef(out.ravel(), gold.ravel())[0, 1] > 0.999


@pytest.mark.slow
def test_siddon_fast_gradient_finite_difference(scene):
    """The analytic adjoint is the exact gradient of the eps-smoothed Siddon
    forward: central finite differences of the SAME function must agree."""
    density, affinv, det, src, tgt, perm, ref = scene
    ww = measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (H, H)
    )
    ref0 = jnp.asarray(ref[:1])

    def f(r6):
        p = convert(r6[None, :3], r6[None, 3:], "euler_angles", "ZXY", degrees=True)
        s, t = det.rays(p)
        img = raymarch_siddon_fast(
            density, affinv, s, t, perm=perm, warp_window=ww
        )
        return jnp.sum((img - ref0) ** 2)

    r0 = np.asarray([2.2, -1.3, 2.7, 4.0, 610.0, -7.0])
    g = np.asarray(jax.grad(f)(jnp.asarray(r0)))
    fd = np.zeros(6)
    hs = [1e-3] * 3 + [1e-2] * 3
    for i in range(6):
        e = np.zeros(6)
        e[i] = hs[i]
        fd[i] = (float(f(jnp.asarray(r0 + e))) - float(f(jnp.asarray(r0 - e)))) / (2 * hs[i])
    cos = g @ fd / (np.linalg.norm(g) * np.linalg.norm(fd))
    assert cos > 0.99, (g, fd)
    assert abs(np.linalg.norm(g) / np.linalg.norm(fd) - 1.0) < 0.1


def _label_scene():
    """Anisotropic blob with a 2-label sphere mask."""
    rng = np.random.default_rng(5)
    n = 40
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    r2 = X**2 + Y**2 + Z**2
    blob = np.exp(-r2 * 4.0)
    density = jnp.asarray((blob * 0.8 + rng.uniform(0, 0.02, blob.shape)).astype(np.float32))
    mask = np.zeros((n, n, n), np.int32)
    mask[r2 < 0.5] = 1
    mask[(X > 0) & (r2 < 0.25)] = 2
    spacing = 2.4
    aff = np.eye(4, dtype=np.float32) * spacing
    aff[3, 3] = 1.0
    aff[:3, 3] = -(n - 1) / 2.0 * spacing
    affinv = jnp.asarray(np.linalg.inv(aff))
    det = Detector(sdd=800.0, height=32, width=32, delx=3.0, dely=3.0)
    pose = convert(
        jnp.asarray([[181.0, -2.0, 1.0], [177.0, 3.0, -1.5]]),
        jnp.asarray([[3.0, 450.0, -4.0], [-2.0, 500.0, 3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    src, tgt = det.rays(pose)
    from xvr_tpu.render.pallas import _choose_permutation

    d_mean = np.asarray(tgt.mean((0, 1)) - src.mean((0, 1)))
    A = np.asarray(affinv)
    perm = _choose_permutation(A[:3, :3] @ d_mean)
    # a 32^2 detector fits inside one lane tile, so the per-tile slope-row
    # span approaches the full grid: the window MUST be measured (an
    # undersized one silently clips — the trap with_shearwarp documents)
    ww = measured_warp_window(
        np.asarray(src), np.asarray(tgt), np.asarray(affinv), perm, (32, 32)
    )
    return density, jnp.asarray(mask), affinv, src, tgt, perm, ww


def _masked_volume_golden(density, mask, labels, affinv, src, tgt, n_samples=512):
    """XLA-exact golden with the masked-volume channel semantics: channel c
    renders density restricted to that label's voxels (trilinear of the
    masked grid). This is the semantics the shear-warp channel path
    implements; it differs from the NN-label golden only within one voxel of
    label boundaries (both sum to the unmasked render)."""
    fg = [np.asarray(mask) == l for l in labels]
    bg = ~np.any(fg, axis=0)
    chans = [
        xla.raymarch_trilinear(density * jnp.asarray(w), affinv, src, tgt, n_samples=n_samples)
        for w in [bg, *fg]
    ]
    return np.stack([np.asarray(c) for c in chans], axis=1)


@pytest.mark.slow
def test_channel_rendering_matches_golden():
    """Per-channel masked-volume rendering: channels must sum exactly to the
    unmasked render and match the XLA masked-volume golden; against the
    NN-label golden (different boundary semantics) correlation stays high."""
    density, mask, affinv, src, tgt, perm, ww = _label_scene()
    labels = (1, 2)
    out = np.asarray(
        raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, mask=mask, labels=labels,
            perm=perm, warp_window=ww,
        )
    )
    assert out.shape[1] == 3  # background + 2 labels
    total = np.asarray(
        raymarch_trilinear_shearwarp(density, affinv, src, tgt, perm=perm, warp_window=ww)
    )
    np.testing.assert_allclose(out.sum(axis=1), total, rtol=1e-2, atol=1e-2)
    gold = _masked_volume_golden(density, mask, labels, affinv, src, tgt)
    scale = np.abs(gold).max()
    for c in range(3):
        err = np.abs(out[:, c] - gold[:, c]).max() / scale
        assert err < 0.04, (c, err)
    # NN-label golden: same integral, different boundary split — channels
    # must still correlate strongly
    nn = np.asarray(
        xla.raymarch_trilinear(
            density, affinv, src, tgt, n_samples=512, mask=mask, labels=labels
        )
    )
    np.testing.assert_allclose(out.sum(axis=1), nn.sum(axis=1), rtol=2e-2, atol=2e-2)
    for c in range(3):
        cc = np.corrcoef(out[:, c].ravel(), nn[:, c].ravel())[0, 1]
        # loosest for the low-magnitude background shell, where the boundary
        # split is the largest relative effect
        assert cc > 0.95, (c, cc)


@pytest.mark.slow
def test_channel_fast_path_differentiable():
    """Gradients flow through the channel fast path and match the XLA channel
    renderer's gradients in direction."""
    density, mask, affinv, src, tgt, perm, ww = _label_scene()
    labels = (1, 2)
    det = Detector(sdd=800.0, height=32, width=32, delx=3.0, dely=3.0)
    target_img = jnp.asarray(
        _masked_volume_golden(density, mask, labels, affinv, src[:1], tgt[:1], n_samples=256)
    )

    def loss(render):
        def f(r6):
            p = convert(r6[None, :3], r6[None, 3:], "euler_angles", "ZXY", degrees=True)
            s, t = det.rays(p)
            return jnp.sum((render(s, t) - target_img) ** 2)

        return f

    fast = loss(
        lambda s, t: raymarch_trilinear_fast(
            density, affinv, s, t, mask=mask, labels=labels,
            perm=perm, warp_window=ww,
        )
    )
    fgs = [np.asarray(mask) == l for l in labels]
    bgw = jnp.asarray(~np.any(fgs, axis=0))
    ws = [bgw] + [jnp.asarray(w) for w in fgs]
    gold = loss(
        lambda s, t: jnp.stack(
            [
                xla.raymarch_trilinear(density * w, affinv, s, t, n_samples=256)
                for w in ws
            ],
            axis=1,
        )
    )
    r0 = jnp.asarray([180.5, -1.0, 0.5, 2.0, 460.0, -3.0])
    gf = np.asarray(jax.grad(fast)(r0))
    gx = np.asarray(jax.grad(gold)(r0))
    assert np.isfinite(gf).all() and np.abs(gf).max() > 0
    cos = gf @ gx / (np.linalg.norm(gf) * np.linalg.norm(gx))
    assert cos > 0.98, (gf, gx)


def test_projector_siddon_flavor():
    """with_shearwarp on a siddon projector selects the siddon profile and
    matches the XLA siddon render."""
    from xvr_tpu.render import Projector, make_test_volume

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    proj = Projector.from_volume(vol, sdd=400.0, height=16, delx=3.0, renderer="siddon")
    pose = convert(
        jnp.asarray([[182.0, -1.5, 1.0]]), jnp.asarray([[2.0, 200.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    ref = np.asarray(proj(pose))  # XLA exact siddon
    pp = proj.with_shearwarp(pose)
    assert pp.renderer == "siddon_fast"
    out = np.asarray(pp(pose))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.06


def test_default_grid_shape_bounds():
    assert default_grid_shape((256, 256)) == (256, 256)
    assert default_grid_shape((100, 100)) == (128, 128)
    assert default_grid_shape((1436, 1436)) == (1536, 1536)


@pytest.mark.slow
def test_shearwarp_steep_pose_accuracy():
    """Between 45 and ~70 deg off the march axis (the zone the loosened gate
    admits — the slab kernel's hard 45-deg invariant does not apply to the
    shear-warp factorization), renders must still match the XLA golden
    model: steeper rays only widen the per-image slope grid."""
    from xvr_tpu.render import Projector, make_test_volume

    vol = make_test_volume(32, spacing=2.0, kind="gradient")
    proj = Projector.from_volume(vol, sdd=400.0, height=16, delx=3.0)
    # probe set spanning the DeepFluoro training envelope relative to one
    # march axis: corners reach ~55-60 deg off axis
    rots = jnp.asarray([
        [135.0, -45.0, 0.0], [135.0, 45.0, 0.0], [180.0, 0.0, 0.0],
        [225.0, -45.0, 0.0], [225.0, 45.0, 0.0],
    ])
    xyzs = jnp.tile(jnp.asarray([[0.0, 200.0, 0.0]]), (5, 1))
    poses = convert(rots, xyzs, "euler_angles", "ZXY", degrees=True)
    pp = proj.with_shearwarp(poses, differentiable=False)
    assert pp.renderer == "trilinear_shearwarp", "gate must admit ~60deg corners"
    ref = np.asarray(proj(poses))
    out = np.asarray(pp(poses))
    for i in range(5):
        err = np.abs(out[i] - ref[i]).max() / np.abs(ref[i]).max()
        assert err < 0.06, (i, err)


@pytest.mark.slow
def test_noncubic_anisotropic_volume():
    """Real CTs are non-cubic with anisotropic spacing (DeepFluoro: 512x512xZ
    at ~0.8x0.8x thicker slices). The shear-warp factorization must handle
    unequal extents/spacings per axis."""
    from xvr_tpu.render import Projector
    from xvr_tpu.render.volume import Volume

    rng = np.random.default_rng(3)
    nx, ny, nz = 48, 40, 28
    gx = np.linspace(-1, 1, nx)[:, None, None]
    gy = np.linspace(-1, 1, ny)[None, :, None]
    gz = np.linspace(-1, 1, nz)[None, None, :]
    blob = np.exp(-((gx * 1.1) ** 2 + (gy * 0.9) ** 2 + (gz * 1.3) ** 2) * 5.0)
    hu = (blob * 900.0 - 1000.0 * (1 - blob)).astype(np.float32)
    sx, sy, sz = 1.6, 1.6, 3.0  # anisotropic spacing (thick slices)
    aff = np.diag([sx, sy, sz, 1.0]).astype(np.float32)
    aff[:3, 3] = [-(nx - 1) / 2 * sx, -(ny - 1) / 2 * sy, -(nz - 1) / 2 * sz]
    vol = Volume(data=jnp.asarray(hu), affine=jnp.asarray(aff))
    proj = Projector.from_volume(vol, sdd=700.0, height=48, delx=2.5)
    rot = jnp.asarray([[181.0, -2.0, 1.5], [178.0, 3.0, -2.0]])
    xyz = jnp.asarray([[4.0, 400.0, -6.0], [-3.0, 450.0, 5.0]])
    pose = convert(rot, xyz, "euler_angles", "ZXY", degrees=True)
    ref = np.asarray(proj(pose))
    sw = proj.with_shearwarp(pose, differentiable=False)
    assert sw.renderer == "trilinear_shearwarp"
    out = np.asarray(sw(pose))
    for i in range(2):
        err = np.abs(out[i] - ref[i]).max() / np.abs(ref[i]).max()
        assert err < 0.05, (i, err)


@pytest.mark.slow
def test_channel_slab_bounds_exact():
    """Static per-label slab bounds: bounded channel renders must equal the
    dense (all-slab) renders exactly — slabs outside a label's bounding box
    contribute nothing — and the bounds must cover every label voxel."""
    from xvr_tpu.render.shearwarp import channel_slab_bounds

    density, mask, affinv, src, tgt, perm, ww = _label_scene()
    labels = (1, 2)
    bounds = channel_slab_bounds(mask, labels, perm, quantum=8)
    m = np.transpose(np.asarray(mask), perm)
    M = m.shape[0]
    assert bounds[0] == (0, M)
    for (k0, k1), l in zip(bounds[1:], labels):
        hit = np.flatnonzero(np.any(m == l, axis=(1, 2)))
        assert k0 <= hit[0] and hit[-1] < k1
    # at least one compact label actually restricts the march in this scene
    assert any(k1 - k0 < M for k0, k1 in bounds[1:])

    dense = np.asarray(
        raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, mask=mask, labels=labels,
            perm=perm, warp_window=ww,
        )
    )
    bounded = np.asarray(
        raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, mask=mask, labels=labels,
            perm=perm, warp_window=ww, chan_bounds=bounds,
        )
    )
    np.testing.assert_allclose(bounded, dense, rtol=1e-6, atol=1e-6)


def test_with_shearwarp_sets_channel_bounds():
    """Projector.with_shearwarp measures static label bounds from the mask."""
    from xvr_tpu.render import Projector
    from xvr_tpu.render.volume import Volume

    density, mask, affinv, src, tgt, perm, ww = _label_scene()
    aff = jnp.asarray(np.linalg.inv(np.asarray(affinv)))
    vol = Volume(
        data=density * 1000.0, affine=aff, mask=jnp.asarray(mask), orientation="AP"
    )
    proj = Projector.from_volume(
        vol, sdd=800.0, height=32, delx=3.0, labels=(1, 2)
    )
    pose = convert(
        jnp.asarray([[180.0, 0.0, 0.0]]), jnp.asarray([[0.0, 450.0, 0.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    up = proj.with_shearwarp(pose, probe_poses=pose)
    if not up.renderer.endswith("_fast"):
        pytest.skip("steepness gate kept the XLA renderer for this geometry")
    assert up.shearwarp_bounds is not None
    assert len(up.shearwarp_bounds) == 3
    M = np.transpose(np.asarray(mask), up.pallas_perm).shape[0]
    assert up.shearwarp_bounds[0] == (0, M)
    for k0, k1 in up.shearwarp_bounds[1:]:
        assert 0 <= k0 < k1 <= M


@pytest.mark.slow
def test_warp_remap_matches_plain_layout():
    """The barrel-sheared warp layout is a pure re-tiling: forward renders
    and fast-path gradients must match the plain layout to fp precision, with
    each layout sized by its own measured window (strong in-plane roll is
    where the layouts differ most)."""
    n = 32
    g = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    density = jnp.asarray(
        np.exp(-(X**2 + 0.7 * Y**2 + 1.3 * Z**2) * 4.0).astype(np.float32) * 0.8
    )
    sp = 3.0
    aff = np.eye(4, dtype=np.float32) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -(n - 1) / 2.0 * sp
    affinv = jnp.asarray(np.linalg.inv(aff))
    det = Detector(sdd=700.0, height=48, width=48, delx=2.5, dely=2.5)
    pose = convert(
        jnp.asarray([[181.0, -2.0, 14.0], [179.0, 3.0, -12.0]]),
        jnp.asarray([[3.0, 420.0, -4.0], [-2.0, 450.0, 3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    src, tgt = det.rays(pose)
    from xvr_tpu.render.pallas import _choose_permutation

    A = np.asarray(affinv)
    d_mean = np.asarray(tgt.mean((0, 1)) - src.mean((0, 1)))
    perm = _choose_permutation(A[:3, :3] @ d_mean)

    w_plain = measured_warp_window(np.asarray(src), np.asarray(tgt), A, perm, (48, 48))
    w_remap = measured_warp_window(
        np.asarray(src), np.asarray(tgt), A, perm, (48, 48), remap=True
    )
    assert w_remap <= w_plain  # the shear never widens the window

    out_plain = np.asarray(raymarch_trilinear_shearwarp(
        density, affinv, src, tgt, perm=perm, warp_window=-(-w_plain // 8) * 8
    ))
    out_remap = np.asarray(raymarch_trilinear_shearwarp(
        density, affinv, src, tgt, perm=perm,
        warp_window=-(-w_remap // 8) * 8, warp_remap=True,
    ))
    np.testing.assert_allclose(out_remap, out_plain, rtol=1e-5, atol=1e-6)

    def loss(t, remap, ww):
        return jnp.sum(raymarch_trilinear_fast(
            density, affinv, src, t, perm=perm, warp_window=ww, warp_remap=remap
        ) ** 2)

    g1 = np.asarray(jax.grad(lambda t: loss(t, False, -(-w_plain // 8) * 8))(tgt))
    g2 = np.asarray(jax.grad(lambda t: loss(t, True, -(-w_remap // 8) * 8))(tgt))
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-6 * np.abs(g1).max())


@pytest.mark.parametrize("eps,k0,k1,sgnval", [
    (1.0, 0, None, 1.0),
    (0.25, 0, None, 1.0),
    (1.0, 4, 12, -1.0),
])
def test_fused_accumulate_matches_xla(eps, k0, k1, sgnval):
    """The Pallas fused accumulate (interpret mode) reproduces the XLA scan
    bit-for-nearly-bit: same hat factors, same bf16 casts, same f32 MXU
    accumulation — including static [k0, k1) slab bounds and batch padding
    (B=5 pads to the kernel's 8-image tile)."""
    from xvr_tpu.render.shearwarp import _accumulate, _accumulate_fused

    rng = np.random.default_rng(3)
    M, Wd, L = 16, 10, 20
    Iu, Iv = 16, 128
    B = 5
    vol = jnp.asarray(rng.normal(0.5, 0.3, (M, Wd, L)).astype(np.float32)).astype(jnp.bfloat16)
    s_p = jnp.asarray(rng.normal(0.0, 2.0, (B, 3)).astype(np.float32) + np.array([-8.0, 5.0, 10.0], np.float32))
    sgn = jnp.full((B,), sgnval, jnp.float32)
    u0 = jnp.asarray(rng.normal(-0.5, 0.1, B).astype(np.float32))
    du = jnp.asarray(rng.uniform(0.02, 0.08, B).astype(np.float32))
    v0 = jnp.asarray(rng.normal(-0.8, 0.1, B).astype(np.float32))
    dv = jnp.asarray(rng.uniform(0.02, 0.05, B).astype(np.float32))

    kw = dict(Iu=Iu, Iv=Iv, unroll=4, eps=eps, k0=k0, k1=k1)
    ref = np.asarray(_accumulate(vol, s_p, sgn, u0, du, v0, dv, **kw))
    got = np.asarray(_accumulate_fused(vol, s_p, sgn, u0, du, v0, dv, interpret=True, **kw))
    assert got.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3 * scale)


@pytest.mark.parametrize("eps,k0,k1", [(1.0, 0, None), (0.25, 2, 14)])
def test_fused_adjoint_matches_xla(eps, k0, k1):
    """The Pallas fused adjoint (interpret mode) matches the XLA scan adjoint
    for the source-position gradient, including slab bounds and batch pad."""
    from xvr_tpu.render.shearwarp import _accumulate_adjoint, _accumulate_adjoint_fused

    rng = np.random.default_rng(7)
    M, Wd, L = 16, 10, 20
    Iu, Iv = 16, 128
    B = 5
    vol = jnp.asarray(rng.normal(0.5, 0.3, (M, Wd, L)).astype(np.float32)).astype(jnp.bfloat16)
    s_p = jnp.asarray(rng.normal(0.0, 2.0, (B, 3)).astype(np.float32) + np.array([-8.0, 5.0, 10.0], np.float32))
    sgn = jnp.ones((B,), jnp.float32)
    u0 = jnp.asarray(rng.normal(-0.5, 0.1, B).astype(np.float32))
    du = jnp.asarray(rng.uniform(0.02, 0.08, B).astype(np.float32))
    v0 = jnp.asarray(rng.normal(-0.8, 0.1, B).astype(np.float32))
    dv = jnp.asarray(rng.uniform(0.02, 0.05, B).astype(np.float32))
    Ibar = jnp.asarray(rng.normal(0.0, 1.0, (B, Iu, Iv)).astype(np.float32))

    kw = dict(Iu=Iu, Iv=Iv, unroll=4, eps=eps, k0=k0, k1=k1)
    ref = np.asarray(_accumulate_adjoint(vol, s_p, sgn, u0, du, v0, dv, Ibar, **kw))
    got = np.asarray(_accumulate_adjoint_fused(vol, s_p, sgn, u0, du, v0, dv, Ibar, interpret=True, **kw))
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-3 * scale)


def test_fused_dispatch_gating():
    """_fused_tile matches the tile to the (small) batch — the regime where
    the fused kernel beats the XLA scan — and refuses large batches,
    unaligned shapes, and VMEM-overflowing grids (-> XLA fallback)."""
    from xvr_tpu.render.shearwarp import _fused_tile

    assert _fused_tile((256, 256, 256), 256, 256, 8, 1) == 1  # registration
    assert _fused_tile((256, 256, 256), 256, 256, 8, 4) == 4
    assert _fused_tile((4, 256, 256, 256), 256, 256, 8, 2) == 2  # channel stack
    assert _fused_tile((512, 512, 512), 1536, 1024, 8, 1) == 1  # full-res stage
    assert _fused_tile((256, 256, 256), 256, 256, 8, 8) is None  # training/render batch
    assert _fused_tile((256, 256, 256), 256, 256, 8, 192) is None
    assert _fused_tile((256, 256, 256), 250, 256, 8, 1) is None  # Iu not sublane-aligned
    assert _fused_tile((256, 256, 256), 256, 200, 8, 1) is None  # Iv not lane-aligned
    assert _fused_tile((512, 512, 512), 1536, 1536, 8, 7) is None  # VMEM overflow

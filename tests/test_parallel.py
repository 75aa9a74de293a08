"""Multi-device mesh tests on the 8 virtual CPU devices (conftest.py).

The reference is single-GPU (SURVEY.md section 2c), so the (dp, rays) mesh is
new surface that must carry its own proof: sharded training steps must return
finite metrics AND match the mesh-free computation bit-for-bit-ish (same PRNG
key, GSPMD only reorders reductions), and ray-sharded renders must equal the
unsharded render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import convert, make_translation
from xvr_tpu.io import save_nifti
from xvr_tpu.parallel import make_mesh, replicated, shard_batch, shard_rays
from xvr_tpu.render import Projector
from xvr_tpu.render.volume import make_test_volume
from xvr_tpu.train.trainer import Trainer

RANGES = dict(
    alphamin=165.0, alphamax=195.0, betamin=-15.0, betamax=15.0,
    gammamin=-15.0, gammamax=15.0, txmin=-10.0, txmax=10.0,
    tymin=150.0, tymax=250.0, tzmin=-10.0, tzmax=10.0,
)


def _write_phantom(d):
    n, spacing = 24, 4.0
    c = (n - 1) / 2
    idx = np.arange(n)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= (n / 3) ** 2, 200.0, -1000.0).astype(np.float32)
    hu += np.where(r2 <= (n / 6) ** 2, 800.0, 0.0)
    aff = np.eye(4) * spacing
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * spacing
    save_nifti(d / "ct.nii.gz", hu, aff)
    return d / "ct.nii.gz"


def _trainer(volpath, outdir, mesh=None, **kw):
    args = dict(
        volpath=volpath, maskpath=None, outpath=outdir,
        sdd=400.0, height=32, delx=4.0, model_name="resnet18",
        batch_size=8, n_total_itrs=2, n_warmup_itrs=1,
        n_grad_accum_itrs=1, n_save_every_itrs=100, lr=1e-3,
        mesh=mesh, **RANGES,
    )
    args.update(kw)
    return Trainer(**args)


def test_make_mesh_shapes():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    m2 = make_mesh(2)
    assert dict(m2.shape) == {"dp": 2, "rays": 1}
    m8 = make_mesh(8)
    assert dict(m8.shape) == {"dp": 4, "rays": 2}
    m8dp = make_mesh(8, rays=1)
    assert dict(m8dp.shape) == {"dp": 8, "rays": 1}
    with pytest.raises(ValueError):
        make_mesh(6, rays=4)


@pytest.mark.slow
def test_sharded_step_finite_8dev(tmp_path):
    vol = _write_phantom(tmp_path)
    mesh = make_mesh(8)
    tr = _trainer(vol, tmp_path / "out", mesh=mesh)
    with mesh:
        metrics = {k: float(v) for k, v in jax.device_get(tr.step(0)).items()}
    assert np.isfinite(metrics["loss"]), metrics
    assert 0.0 <= metrics["kept"] <= 1.0


@pytest.mark.slow
def test_dp_sharded_loss_matches_single_device(tmp_path):
    """Same seed => identical pose/contrast/augment draws, so the dp-sharded
    loss must equal the mesh-free loss up to reduction reordering."""
    vol = _write_phantom(tmp_path)
    tr_ref = _trainer(vol, tmp_path / "ref", mesh=None, seed=7)
    m_ref = {k: float(v) for k, v in jax.device_get(tr_ref.step(0)).items()}

    mesh = make_mesh(2)
    tr_dp = _trainer(vol, tmp_path / "dp", mesh=mesh, seed=7)
    with mesh:
        m_dp = {k: float(v) for k, v in jax.device_get(tr_dp.step(0)).items()}

    assert np.isfinite(m_ref["loss"]) and np.isfinite(m_dp["loss"])
    np.testing.assert_allclose(m_dp["loss"], m_ref["loss"], rtol=2e-4)
    np.testing.assert_allclose(m_dp["kept"], m_ref["kept"], atol=1e-6)

    # parameters after the update must agree too (grad psum == serial sum)
    leaves_ref = jax.tree.leaves(tr_ref.params)
    leaves_dp = jax.tree.leaves(jax.device_get(tr_dp.params))
    for a, b in zip(leaves_ref, leaves_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5)


def test_shard_rays_render_matches_unsharded():
    """A ray-sharded render over (dp, rays) equals the single-device render."""
    vol = make_test_volume(24, spacing=4.0, kind="sphere")
    proj = Projector.from_volume(vol, sdd=400.0, height=32, delx=4.0, n_samples=64)
    pose = convert(
        jnp.asarray([[180.0, 5.0, -3.0], [170.0, -5.0, 3.0]]),
        jnp.asarray([[0.0, 200.0, 0.0], [5.0, 220.0, -5.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    ).compose(make_translation(vol.center))

    ref = jax.jit(lambda m: proj(__import__("xvr_tpu").geometry.RigidTransform(m)))(
        pose.matrix
    )

    mesh = make_mesh(8)

    @jax.jit
    def sharded(matrix):
        from xvr_tpu.geometry import RigidTransform

        p = RigidTransform(shard_batch(mesh, matrix))
        src, tgt = proj.rays(p)
        tgt = shard_rays(mesh, tgt)
        raw = proj.render_rays(src, tgt)
        return proj.reshape_transform(raw, matrix.shape[0])

    with mesh:
        out = jax.device_get(sharded(pose.matrix))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_mesh_step_uses_fast_renderer(tmp_path):
    """Under a mesh the shear-warp MXU renderer still upgrades (no slab
    fallback): the sharded step renders through shard_map and matches the
    mesh-free fast-path step for the same PRNG key."""
    vol = _write_phantom(tmp_path)

    tr_ref = _trainer(vol, tmp_path / "ref", mesh=None, seed=3)
    assert tr_ref._try_shearwarp_strata([165.0, 195.0])
    tr_ref._step = tr_ref._build_step()
    m_ref = {k: float(v) for k, v in jax.device_get(tr_ref.step(0)).items()}

    mesh = make_mesh(8)
    tr = _trainer(vol, tmp_path / "mesh", mesh=mesh, seed=3)
    assert tr._try_shearwarp_strata([165.0, 195.0])
    assert all(p.renderer == "trilinear_fast" for p in tr.projectors[0])
    assert all(c % mesh.size == 0 for c in tr.strata_counts)
    tr._step = tr._build_step()
    with mesh:
        m = {k: float(v) for k, v in jax.device_get(tr.step(0)).items()}

    assert np.isfinite(m["loss"])
    np.testing.assert_allclose(m["loss"], m_ref["loss"], rtol=2e-3)
    np.testing.assert_allclose(m["kept"], m_ref["kept"], atol=1e-6)


def test_mesh_rounds_batch_to_device_multiple(tmp_path):
    vol = _write_phantom(tmp_path)
    mesh = make_mesh(8)
    tr = _trainer(vol, tmp_path / "o", mesh=mesh, batch_size=10)
    assert tr.batch_size == 16
    assert tr.config["batch_size"] == 16


def test_replicated_and_shard_batch_specs():
    mesh = make_mesh(8)
    x = jnp.arange(16.0).reshape(8, 2)
    xr = replicated(mesh, x)
    assert xr.sharding.is_fully_replicated
    with mesh:
        xs = jax.jit(lambda v: shard_batch(mesh, v))(x)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))
    # batch axis actually split over dp
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert (2, 2) in shard_shapes


@pytest.mark.slow
def test_mesh_masked_channel_step(tmp_path):
    """Masked (foundation-style) training under a mesh: the channel fast
    renderer runs inside shard_map with static per-label slab bounds and the
    sharded loss matches the mesh-free run for the same PRNG key."""
    volpath = _write_phantom(tmp_path)
    n = 24
    hu = np.asarray(jax.device_get(__import__("xvr_tpu").io.volumes.read(volpath).data))
    mask = (hu > 300.0).astype(np.float32)
    maskpath = tmp_path / "mask.nii.gz"
    aff = np.eye(4) * 4.0
    aff[3, 3] = 1.0
    aff[:3, 3] = -(n - 1) / 2 * 4.0
    save_nifti(maskpath, mask, aff)

    tr_ref = _trainer(volpath, tmp_path / "ref", mesh=None, maskpath=maskpath, seed=5)
    assert tr_ref.labels == (1,)
    assert tr_ref._try_shearwarp_strata([165.0, 195.0])
    assert tr_ref.projectors[0][0].shearwarp_bounds is not None
    tr_ref._step = tr_ref._build_step()
    m_ref = {k: float(v) for k, v in jax.device_get(tr_ref.step(0)).items()}

    mesh = make_mesh(2)
    tr = _trainer(volpath, tmp_path / "mesh", mesh=mesh, maskpath=maskpath, seed=5)
    assert tr._try_shearwarp_strata([165.0, 195.0])
    assert all(p.renderer == "trilinear_fast" for p in tr.projectors[0])
    tr._step = tr._build_step()
    with mesh:
        m = {k: float(v) for k, v in jax.device_get(tr.step(0)).items()}

    assert np.isfinite(m["loss"]) and np.isfinite(m["dice"])
    np.testing.assert_allclose(m["loss"], m_ref["loss"], rtol=2e-3)


def test_mesh_batched_registration(tmp_path):
    """Batched registration sharded over an 8-device dp mesh: rows of a
    duplicated X-ray stay identical (per-image independence survives the
    sharding), the padded-K path truncates, and the result matches the
    mesh-free run's starting similarity."""
    from xvr_tpu.io import dcmwrite
    from xvr_tpu.io.volumes import read
    from xvr_tpu.registrar import RegistrarFixed

    volpath = _write_phantom(tmp_path)
    vol = read(volpath)
    proj = Projector.from_volume(vol, sdd=400.0, height=32, delx=6.0)
    gt_pose = convert(
        jnp.array([[183.0, -2.0, 4.0]]), jnp.array([[2.0, 200.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(gt_pose))[0, 0]
    xray = tmp_path / "xray.dcm"
    dcmwrite(xray, (img / img.max() * 60000).astype(np.uint16),
             sdd=400.0, row_spacing=6.0, col_spacing=6.0)

    def make_reg(mesh):
        return RegistrarFixed(
            volume=volpath, mask=None, orientation="AP",
            rot=[np.pi, 0.0, 0.0], xyz=[0.0, 200.0, 0.0],
            linearize=False, scales="1", n_itrs="4",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            max_n_plateaus=4, verbose=0, mesh=mesh,
        )

    mesh = make_mesh(8, rays=1)
    with mesh:
        res = make_reg(mesh).run_batch([xray] * 8, beta=1.0)
    assert len(res) == 8
    for r in res[1:]:
        np.testing.assert_array_equal(
            np.asarray(res[0][4].matrix), np.asarray(r[4].matrix)
        )
        np.testing.assert_array_equal(
            res[0][5]["trajectory"]["ncc"], r[5]["trajectory"]["ncc"]
        )

    # K=3 pads to 8 internally and truncates back
    with mesh:
        res3 = make_reg(mesh).run_batch([xray] * 3, beta=1.0)
    assert len(res3) == 3

    # the sharded run starts from the same similarity as the mesh-free run
    ref = make_reg(None).run_batch([xray], beta=1.0)
    np.testing.assert_allclose(
        res[0][5]["trajectory"]["ncc"][0], ref[0][5]["trajectory"]["ncc"][0],
        atol=1e-5,
    )

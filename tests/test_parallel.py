"""Multi-device mesh tests on the 8 virtual CPU devices (conftest.py).

The reference is single-GPU (SURVEY.md section 2c), so the (dp, rays) mesh is
new surface that must carry its own proof: sharded training steps must return
finite metrics AND match the mesh-free computation bit-for-bit-ish (same PRNG
key, GSPMD only reorders reductions), and ray-sharded renders must equal the
unsharded render.
"""

from pathlib import Path

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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_step_no_involuntary_remat(tmp_path):
    """The mesh step must compile without GSPMD's "Involuntary full
    rematerialization" warning (VERDICT r2 #3: an unpinned GroupNorm backward
    sharding forced a replicate-then-repartition re-layout every step), and
    the compiled HLO's collective traffic must be bounded by one gradient
    psum: total collective bytes (all-reduce + all-gather + all-to-all +
    permutes) <= ~2.5x the parameter bytes. The ray-axis reshards are small
    all-to-alls of ray tensors; the grad psum dominates.

    A wall-time sharded-vs-serial assertion is deliberately NOT made: this
    host exposes a single core (nproc=1), so 8 virtual devices timeshare it
    and collective rendezvous scheduling noise (20s+ stalls logged by
    rendezvous.cc) dominates any timing — the HLO byte count is the
    deterministic, hardware-independent observable for the same regression.

    Runs in a subprocess: the SPMD partitioner warning is emitted by C++
    (absl) logging, which pytest cannot capture in-process.
    """
    import json
    import os
    import subprocess
    import sys
    import textwrap

    script = tmp_path / "remat_probe.py"
    script.write_text(textwrap.dedent("""
        import json, sys
        import numpy as np
        import jax, jax.numpy as jnp

        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)   # tests dir (for the shared fixtures)
        sys.path.insert(0, %r)   # repo root (xvr_tpu is not pip-installed)
        from test_parallel import RANGES, _trainer, _write_phantom

        vol = _write_phantom(__import__("pathlib").Path(%r))
        from xvr_tpu.parallel import make_mesh

        mesh = make_mesh(8)
        with mesh:
            tr = _trainer(vol, %r + "/out_mesh", mesh=mesh, n_total_itrs=8)
            key = jax.random.PRNGKey(0)
            lowered = tr._step.lower(
                tr.params, tr.opt_state, key, tr.projectors[0],
                tr.centers[0], jnp.eye(4),
            )
            txt = lowered.compile().as_text()
            tr.step(0)  # also execute once: surfaces runtime SPMD warnings
            jax.block_until_ready(tr.params)

        from xvr_tpu.parallel import collective_bytes_summary

        summary = collective_bytes_summary(txt)
        n_params = sum(
            int(np.prod(np.asarray(x.shape)))
            for x in jax.tree.leaves(tr.params)
        )
        vol_bytes = 4 * int(np.prod(np.asarray(
            tr.projectors[0][0].density.shape)))
        summary["param_bytes"] = 4 * n_params
        summary["volume_bytes"] = vol_bytes
        print(json.dumps(summary))
    """) % (str(Path(__file__).parent), str(Path(__file__).parent.parent),
            str(tmp_path), str(tmp_path)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=900, env=env, cwd=str(Path(__file__).parent),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Involuntary full rematerialization" not in r.stderr, (
        "GSPMD re-layout is back:\n" + r.stderr[-2000:]
    )
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    # one psum of the grad pytree (+ small ray-axis reshards and scalar
    # metric reductions); 2.5x headroom covers reduce-scatter/all-gather
    # decompositions of the same psum. The involuntary re-layout this guards
    # against moved full activation tensors through extra collectives.
    assert stats["total_collective_bytes"] <= 2.5 * stats["param_bytes"], stats
    # the expected collectives ARE there: gradient/loss psums compile to
    # all-reduces (a step with none would mean the mesh isn't actually
    # reducing anything — a silently-replicated "parallel" step)
    assert stats["n_allreduce"] >= 1, stats
    # and the CT volume (replicated per chip by design, SURVEY.md section
    # 2c) is never all-gathered: any volume-sized all-gather means GSPMD
    # decided to shard-then-regather the density, an HBM-bandwidth
    # regression invisible in wall-time on the CPU mesh
    assert stats["biggest_allgather_bytes"] < stats["volume_bytes"], stats


@pytest.mark.slow
def test_shard_rays_fast_render_matches_unsharded():
    """Ray-sharding the FAST (shear-warp) renderer (VERDICT r2 #7): the
    detector warp is row-blocked over the rays axis inside shard_map while
    each device repeats the per-image slope accumulate; with the slope grid
    fitted to the full detector, the sharded render equals the unsharded
    fast render, and pose gradients match through the custom VJP."""
    from xvr_tpu.geometry import RigidTransform
    from xvr_tpu.parallel import ray_sharded_fast_render

    vol = make_test_volume(24, spacing=4.0, kind="sphere")
    proj = Projector.from_volume(vol, sdd=400.0, height=32, delx=4.0)
    pose = convert(
        jnp.asarray([[180.0, 5.0, -3.0], [170.0, -5.0, 3.0],
                     [185.0, 2.0, 1.0], [175.0, -2.0, -1.0]]),
        jnp.asarray([[0.0, 200.0, 0.0], [5.0, 220.0, -5.0],
                     [-3.0, 210.0, 2.0], [2.0, 205.0, -2.0]]),
        parameterization="euler_angles", convention="ZXY", degrees=True,
    ).compose(make_translation(vol.center))

    fast = proj.with_shearwarp(pose)
    assert fast.renderer == "trilinear_fast", fast.renderer
    prepared = fast.prepare_for_shearwarp(fast.density)

    def ref_render(matrix):
        src, tgt = fast.rays(RigidTransform(matrix))
        return fast.render_rays(src, tgt, prepared=prepared)

    ref = jax.jit(ref_render)(pose.matrix)

    mesh = make_mesh(8)  # {dp: 4, rays: 2} -> 16-row warp blocks

    @jax.jit
    def sharded(matrix):
        return ray_sharded_fast_render(
            mesh, fast, RigidTransform(matrix), prepared=prepared
        )

    with mesh:
        out = jax.device_get(sharded(pose.matrix))
    # 5e-5: the full-detector grid fit reduces min/max in a different
    # association than the reference jit; pure float noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5, atol=5e-5)

    # pose gradients flow through shard_map's transpose and match unsharded
    def loss_sharded(matrix):
        return jnp.sum(ray_sharded_fast_render(
            mesh, fast, RigidTransform(matrix), prepared=prepared
        ) ** 2)

    def loss_ref(matrix):
        return jnp.sum(ref_render(matrix) ** 2)

    with mesh:
        g_sharded = jax.device_get(jax.jit(jax.grad(loss_sharded))(pose.matrix))
    g_ref = jax.device_get(jax.jit(jax.grad(loss_ref))(pose.matrix))
    assert np.isfinite(g_sharded).all()
    # the adjoint's row-block psum reassociates sums whose terms are ~1e5
    # but whose results are ~1e2 (heavy cancellation), so elementwise
    # tolerances must be norm-aware; the gradient field itself must align
    a, b = np.asarray(g_sharded).ravel(), np.asarray(g_ref).ravel()
    scale = np.abs(b).max()
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4 * scale)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 1.0 - 1e-8, cos


@pytest.mark.slow
def test_mesh_single_xray_auto_ray_sharded(tmp_path, monkeypatch):
    """Auto-dispatch of the ray-sharded fast renderer (VERDICT r3 #5): a K=1
    registration on a mesh must NOT be padded out with duplicate images —
    when the stage batch (K * restart_seeds) does not fill the mesh, the
    registrar skips padding and sharded_fast_render row-blocks each render
    over the mesh via parallel.ray_sharded_fast_render. Proof is the spy on
    that function (padding would make the batch divisible and route to the
    whole-per-device path instead) plus result parity with the mesh-free
    run. Detector height 36 also exercises the row-padding path (36/2=18
    rows over 8 shards pads to 24)."""
    from xvr_tpu.io import dcmwrite
    from xvr_tpu.io.volumes import read
    from xvr_tpu.registrar import RegistrarFixed
    import xvr_tpu.parallel.mesh as pmesh

    monkeypatch.setenv("XVR_FORCE_SHEARWARP", "1")
    volpath = _write_phantom(tmp_path)
    vol = read(volpath)
    proj = Projector.from_volume(vol, sdd=400.0, height=36, delx=5.0)
    gt_pose = convert(
        jnp.array([[183.0, -2.0, 4.0]]), jnp.array([[2.0, 200.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(gt_pose))[0, 0]
    xray = tmp_path / "xray.dcm"
    dcmwrite(xray, (img / img.max() * 60000).astype(np.uint16),
             sdd=400.0, row_spacing=5.0, col_spacing=5.0)

    calls = []
    orig = pmesh.ray_sharded_fast_render

    def spy(*a, **k):
        calls.append(a[0].shape)  # the mesh of each dispatch
        return orig(*a, **k)

    monkeypatch.setattr(pmesh, "ray_sharded_fast_render", spy)

    def make_reg(mesh, seeds):
        return RegistrarFixed(
            volume=volpath, mask=None, orientation="AP",
            rot=[np.pi, 0.0, 0.0], xyz=[0.0, 200.0, 0.0],
            linearize=False, scales="2,1", n_itrs="6,4",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            max_n_plateaus=4, verbose=0, mesh=mesh,
            restart_seeds=seeds, max_restarts=0,
        )

    def check(res, ref, tag):
        # identical seeds; renders equal up to reassociation noise (the
        # bitwise render-parity claim lives in
        # test_shard_rays_fast_render_matches_unsharded). Stage 1 must track
        # tightly; later stages may diverge chaotically (Adam + plateau
        # machinery amplify 1e-4 render noise), so the END state is held to
        # "converges comparably", not bit equality.
        m = np.asarray(res[5]["trajectory"]["ncc"], np.float64)
        r = np.asarray(ref[5]["trajectory"]["ncc"], np.float64)
        np.testing.assert_allclose(m[:6], r[:6], atol=2e-3, err_msg=tag)
        assert m[-1] > r[-1] - 0.05, (tag, m[-1], r[-1])

    mesh = make_mesh(8)  # {dp: 4, rays: 2}
    # B = K*S = 4: batch shards over dp, rows over rays
    with mesh:
        res4 = make_reg(mesh, 4).run(xray, beta=1.0)
    assert calls, "fast render did not dispatch to the ray-sharded path"
    check(res4, make_reg(None, 4).run(xray, beta=1.0), "B=4")

    # B = 1: batch replicated, rows over ALL 8 devices (dp folds into rows)
    calls.clear()
    with mesh:
        res1 = make_reg(mesh, 1).run(xray, beta=1.0)
    assert calls, "K=1/S=1 did not ray-shard"
    check(res1, make_reg(None, 1).run(xray, beta=1.0), "B=1")

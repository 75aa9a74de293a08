"""Registrar tests: the end-to-end convergence test on a synthetic phantom.

A DRR rendered at a known pose is written as a DICOM "X-ray"; the registrar
starts from a perturbed pose and must recover the ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import convert
from xvr_tpu.io import dcmwrite, save_nifti
from xvr_tpu.metrics import double_geodesic
from xvr_tpu.registrar import RegistrarFixed, RegistrarRestart, Registration
from xvr_tpu.registrar.base import _parse_scales
from xvr_tpu.render import Projector
from xvr_tpu.io.volumes import read


SDD, HEIGHT, DELX = 400.0, 64, 3.0


@pytest.fixture(scope="module")
def phantom(tmp_path_factory):
    d = tmp_path_factory.mktemp("reg")
    n, sp = 32, 4.0
    c = (n - 1) / 2
    X, Y, Z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= (n / 3) ** 2, 100.0, -1000.0).astype(np.float32)
    hu += np.where(r2 <= (n / 8) ** 2, 900.0, 0.0)
    # off-center markers breaking rotational symmetry AND the beta/tz
    # near-degeneracy (rotation about x vs z-translation compensate unless
    # structure exists at different depths/heights)
    hu[int(c) + 4 : int(c) + 8, int(c) - 2 : int(c) + 2, int(c) + 3 : int(c) + 9] = 1500.0
    hu[int(c) - 9 : int(c) - 5, int(c) + 3 : int(c) + 7, int(c) - 8 : int(c) - 4] = 1800.0
    hu[int(c) - 2 : int(c) + 2, int(c) - 8 : int(c) - 4, int(c) + 6 : int(c) + 10] = 1200.0
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(d / "ct.nii.gz", hu, aff)
    return d


@pytest.fixture(scope="module")
def gt_xray(phantom):
    vol = read(phantom / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=HEIGHT, delx=DELX)
    gt_pose = convert(
        jnp.array([[183.0, -2.0, 4.0]]), jnp.array([[2.0, 220.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(gt_pose))[0, 0]
    img16 = (img / img.max() * 60000).astype(np.uint16)
    p = phantom / "xray.dcm"
    dcmwrite(p, img16, sdd=SDD, row_spacing=DELX, col_spacing=DELX)
    return p, gt_pose


def test_parse_scales():
    # stage factor x * H / (H + crop): detector renders at (H+crop)/x px
    f = _parse_scales("24,12,6", crop=100, height=1336)
    np.testing.assert_allclose(f, [24 * 1336 / 1436, 12 * 1336 / 1436, 6 * 1336 / 1436])


def test_registration_module(phantom):
    vol = read(phantom / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=32, delx=6.0)
    reg = Registration(proj, jnp.array([[np.pi, 0.0, 0.0]]), jnp.array([[0.0, 220.0, 0.0]]))
    img = reg()
    assert img.shape == (1, 1, 32, 32)
    assert np.asarray(reg.pose.matrix).shape == (1, 4, 4)


def test_coarse_seeds_noop_warns(phantom, gt_xray):
    """0 < coarse_seeds <= restart_seeds cannot run the sweep (it would keep
    at least as many starts as it swept); the engine must say so instead of
    silently recording the flag in the bundle as if it had been applied."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=np.asarray(rot0)[0].tolist(), xyz=np.asarray(xyz0)[0].tolist(),
        linearize=False, scales="1", n_itrs="2",
        reverse_x_axis=False, restart_seeds=2, max_restarts=0,
        coarse_seeds=2, verbose=0,
    )
    with pytest.warns(UserWarning, match="coarse_seeds=2 <= restart_seeds=2"):
        reg.run(xray_path)


@pytest.mark.slow
def test_registrar_converges(phantom, gt_xray):
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    # perturb: ~3 deg, ~8 mm
    rot_init = np.asarray(rot0)[0] + np.deg2rad([3.0, -2.0, 2.0])
    xyz_init = np.asarray(xyz0)[0] + np.array([6.0, -8.0, 5.0])

    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz",
        mask=None,
        orientation="AP",
        rot=rot_init.tolist(),
        xyz=xyz_init.tolist(),
        linearize=False,
        scales="2,1",
        n_itrs="150,100",
        reverse_x_axis=False,
        lr_rot=5e-3,
        lr_xyz=1.0,
        max_n_plateaus=4,
        verbose=0,
    )
    out = reg.run(xray_path, beta=1.0)  # pure mNCC for speed
    gt, intrinsics, proj, init_pose, final_pose, kwargs = out

    r_init, t_init, d_init = (float(np.squeeze(x)) for x in double_geodesic(gt_pose, init_pose, SDD))
    r_fin, t_fin, d_final = (float(np.squeeze(x)) for x in double_geodesic(gt_pose, final_pose, SDD))
    # Achievable accuracy here is bounded by the phantom (binary 4 mm voxels,
    # 64^2 detector) and the near-degenerate beta/tz axis of single-view
    # registration: depth along the beam is near-unobservable (renders are
    # pixel-identical mm apart), so the double geodesic — whose translation
    # term depth dominates — only has to IMPROVE, while the components the
    # similarity actually constrains (in-plane translation, rotation) must
    # converge tightly.
    assert d_final < d_init, f"did not converge: {d_init:.2f} -> {d_final:.2f} mm"
    assert t_fin < 8.0, f"translation error too large: {t_fin:.2f} mm"
    assert np.rad2deg(r_fin / SDD) < 2.5, f"rotation error too large: {np.rad2deg(r_fin / SDD):.2f} deg"
    assert kwargs["runtime"] > 0
    traj = kwargs["trajectory"]
    assert len(traj["params"]) == len(traj["times"]) == len(traj["lrs"])
    assert len(traj["ncc"]) >= 2
    # similarity improved over the run
    assert traj["ncc"][-1] > traj["ncc"][0]


def test_registrar_init_only(phantom, gt_xray):
    xray_path, gt_pose = gt_xray
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=[np.pi, 0.0, 0.0], xyz=[0.0, 220.0, 0.0],
        linearize=False, scales="2", n_itrs="10",
        reverse_x_axis=False, init_only=True, verbose=0,
    )
    gt, intrinsics, proj, init_pose, final_pose, kwargs = reg.run(xray_path)
    assert final_pose is None
    assert intrinsics["height"] == HEIGHT
    # x0 sign flip semantics
    assert intrinsics["x0"] == 0.0


def test_warmup_iterations_do_not_tick_patience(phantom, gt_xray):
    """The per-stage lr warmup must not burn ReduceLROnPlateau patience: the
    ramp's tiny steps can't produce threshold-sized gains, so counting them
    as 'bad' iterations hands the scheduler a head start toward a spurious
    plateau. Pin the gate via the recorded per-iteration lrs: starting AT the
    optimum with an unreachable improvement threshold, the first 10x lr drop
    must come no earlier than warmup + patience iterations."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    warmup, patience, lr_rot = 12, 3, 5e-3
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=np.asarray(rot0)[0].tolist(), xyz=np.asarray(xyz0)[0].tolist(),
        linearize=False, scales="2", n_itrs="30",
        reverse_x_axis=False, verbose=0,
        lr_rot=lr_rot, threshold=0.5, patience=patience,
        stage_warmup=warmup, max_n_plateaus=5,
        max_restarts=0,  # restart rows would break the warm-ramp indexing below
    )
    _, _, _, _, _, kwargs = reg.run(xray_path, beta=1.0)
    lrs = np.asarray(kwargs["trajectory"]["lrs"])  # row 0 = initial, row i+1 = iteration i
    warm = np.minimum((np.arange(len(lrs) - 1) + 1.0) / warmup, 1.0)
    scale = lrs[1:, 0] / (lr_rot * warm)  # lr_scale used at each iteration
    drops = np.flatnonzero(scale < 0.5)
    assert drops.size, "no lr drop observed — raise n_itrs"
    assert drops[0] >= warmup + patience, (
        f"patience ticked during warmup: first drop at iteration {drops[0]}, "
        f"expected >= {warmup + patience}"
    )


@pytest.mark.slow
def test_registrar_call_saves_bundle(phantom, gt_xray, tmp_path):
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=np.asarray(rot0)[0].tolist(), xyz=np.asarray(xyz0)[0].tolist(),
        linearize=False, scales="4", n_itrs="5",
        reverse_x_axis=False, verbose=0, saveimg=True,
    )
    outdir = reg(xray_path, tmp_path / "results")
    assert (outdir / "parameters.npz").exists()
    assert (outdir / "parameters.json").exists()
    assert (outdir / "trajectory.csv").exists()
    assert (outdir / "gt.png").exists()
    data = np.load(outdir / "parameters.npz")
    assert data["init_pose"].shape == (1, 4, 4)
    assert data["final_pose"].shape == (1, 4, 4)
    import json

    meta = json.loads((outdir / "parameters.json").read_text())
    assert meta["drr"]["renderer"] == "trilinear"
    assert meta["optimization"]["scales"] == ["4"]
    assert meta["type"] == "fixed"


def test_registrar_restart_uses_saved_pose(phantom, gt_xray, tmp_path):
    xray_path, gt_pose = gt_xray
    reg = RegistrarRestart(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        init_pose=gt_pose,
        linearize=False, scales="4", n_itrs="3",
        reverse_x_axis=False, verbose=0,
    )
    _, _, _, init_pose, _, _ = reg.run(xray_path, beta=1.0)
    np.testing.assert_allclose(np.asarray(init_pose.matrix), np.asarray(gt_pose.matrix))


def test_registrar_dicom_positioner_geometry(phantom):
    """The DICOM-header init pose (positioner angles + source-to-patient
    distance, io/xray.py:77-90 semantics) must orbit the isocenter: source at
    distance sid for ANY angles, beam through the origin, and the rendered
    init DRR must see the phantom."""
    from xvr_tpu.registrar import RegistrarDicom

    vol = read(phantom / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=HEIGHT, delx=DELX)
    img = np.asarray(proj(convert(
        jnp.array([[30.0, 10.0, 0.0]]), jnp.array([[0.0, 220.0, 0.0]]),
        "euler_angles", "ZXY", degrees=True,
    )))[0, 0]
    p = phantom / "xray_pos.dcm"
    dcmwrite(p, (img / img.max() * 60000).astype(np.uint16),
             sdd=SDD, row_spacing=DELX, col_spacing=DELX,
             extra=[(0x0018, 0x1510, b"DS", "30"), (0x0018, 0x1511, b"DS", "10"),
                    (0x0018, 0x1111, b"DS", "220")])

    reg = RegistrarDicom(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        linearize=False, scales="2", n_itrs="5", crop=0,
        reverse_x_axis=False, init_only=True, verbose=0,
    )
    gt, intrinsics, proj_out, init_pose, final_pose, kwargs = reg.run(p)
    assert final_pose is None  # init_only
    rot, xyz = init_pose.convert("euler_angles", "ZXY", degrees=True)
    np.testing.assert_allclose(np.asarray(rot).reshape(-1), [30.0, 10.0, 0.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(xyz).reshape(-1), [0.0, 220.0, 0.0], atol=1e-3)
    # source orbits at radius sid and the init render views the phantom
    assert np.linalg.norm(np.asarray(init_pose.t)) == pytest.approx(220.0, abs=1e-3)
    init_img = np.asarray(proj_out(init_pose))
    assert (init_img > 0).mean() > 0.05


@pytest.mark.slow
def test_registrar_model_init(phantom, gt_xray, tmp_path):
    """`register model`: load a trained checkpoint, resample the X-ray to the
    model's intrinsics, predict an init pose (model.py:85-107 pipeline)."""
    from xvr_tpu.registrar import RegistrarModel
    from xvr_tpu.train.trainer import Trainer

    xray, gt_pose = gt_xray
    tr = Trainer(
        volpath=phantom / "ct.nii.gz", maskpath=None, outpath=tmp_path / "m",
        alphamin=165.0, alphamax=195.0, betamin=-5.0, betamax=5.0,
        gammamin=-5.0, gammamax=5.0, txmin=-5.0, txmax=5.0,
        tymin=180.0, tymax=260.0, tzmin=-5.0, tzmax=5.0,
        sdd=SDD, height=32, delx=DELX * 2, model_name="resnet18",
        batch_size=2, n_total_itrs=1, n_warmup_itrs=1, n_grad_accum_itrs=1,
        n_save_every_itrs=10, lr=1e-3,
    )
    tr.step(0)
    tr._checkpoint(1)
    ckpt = sorted((tmp_path / "m").glob("*.ckpt"))[-1]

    reg = RegistrarModel(
        ckptpath=ckpt, volume=phantom / "ct.nii.gz", mask=None,
        linearize=False, scales="2", n_itrs="5", crop=0,
        reverse_x_axis=False, init_only=True, verbose=0,
    )
    gt, intrinsics, proj_out, init_pose, final_pose, kwargs = reg.run(xray)
    assert init_pose.matrix.shape[-2:] == (4, 4)
    assert np.isfinite(np.asarray(init_pose.matrix)).all()
    # an untrained net predicts near the middle of the unit-conversion range;
    # the pipeline contract is exercised (resample -> crop -> transforms ->
    # forward -> decode), not accuracy
    assert intrinsics["height"] == HEIGHT


@pytest.mark.slow
def test_registrar_equalize_path(phantom, gt_xray):
    """--equalize runs the differentiable histogram equalization inside the
    similarity loop (reference preprocess.py:40-66): the stage must stay
    finite and still improve the similarity."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = np.asarray(rot0)[0] + np.deg2rad([2.0, -1.5, 1.0])
    xyz_init = np.asarray(xyz0)[0] + np.array([4.0, -5.0, 3.0])
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=rot_init.tolist(), xyz=xyz_init.tolist(),
        linearize=False, equalize=True, scales="2", n_itrs="60",
        reverse_x_axis=False, lr_rot=5e-3, verbose=0,
    )
    gt, intrinsics, proj, init_pose, final_pose, kwargs = reg.run(xray_path)
    ncc = kwargs["trajectory"]["ncc"]
    assert len(ncc) >= 2 and np.isfinite(ncc).all()
    assert ncc[-1] > ncc[0]  # similarity improved under equalization


@pytest.mark.slow
def test_objective_gated_restart(phantom, gt_xray, tmp_path):
    """max_restarts folds the reference's two-pass `register restart`
    workflow into one invocation: the pyramid reruns from the final pose with
    fresh Adam moments, and the new pose is kept per-image only when the
    similarity improved — so the restarted run can never end on a worse
    objective than the single-pass run, and the bundle records the setting."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = (np.asarray(rot0)[0] + np.deg2rad([2.0, -1.5, 1.0])).tolist()
    xyz_init = (np.asarray(xyz0)[0] + np.array([4.0, -5.0, 3.0])).tolist()

    def make_reg(max_restarts):
        return RegistrarFixed(
            volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
            rot=rot_init, xyz=xyz_init,
            linearize=False, scales="2", n_itrs="40",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            patience=3, max_n_plateaus=2,  # plateau out early on purpose
            verbose=0, max_restarts=max_restarts,
        )

    single = make_reg(0).run(xray_path, beta=1.0)
    restarted = make_reg(1).run(xray_path, beta=1.0)
    ncc_single = single[5]["trajectory"]["ncc"][-1]
    ncc_restart = restarted[5]["trajectory"]["ncc"][-1]
    assert ncc_restart >= ncc_single - 1e-9, (ncc_restart, ncc_single)
    # pass 1 of both runs is identical, so a kept restart strictly extends
    # the trajectory; a discarded one leaves it untouched
    n_single = len(single[5]["trajectory"]["ncc"])
    n_restart = len(restarted[5]["trajectory"]["ncc"])
    assert n_restart >= n_single
    if n_restart > n_single:
        assert ncc_restart > ncc_single

    outdir = make_reg(1)(xray_path, tmp_path / "restart_bundle")
    import json

    meta = json.loads((outdir / "parameters.json").read_text())
    assert meta["optimization"]["max_restarts"] == 1


@pytest.mark.slow
def test_multistart_restart_never_worse(phantom, gt_xray, tmp_path):
    """The multi-start re-anneal keeps the per-image ARGMAX-similarity seed,
    and seed 0 is the unperturbed pose — so even with absurd jitter the
    invocation can never end on a worse objective than a plain restart, and
    the bundle records the multi-start settings."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = (np.asarray(rot0)[0] + np.deg2rad([2.0, -1.5, 1.0])).tolist()
    xyz_init = (np.asarray(xyz0)[0] + np.array([4.0, -5.0, 3.0])).tolist()

    def make_reg(seeds, jitter_rot=1.0, jitter_xyz=4.0):
        return RegistrarFixed(
            volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
            rot=rot_init, xyz=xyz_init,
            linearize=False, scales="2", n_itrs="40",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            patience=3, max_n_plateaus=2, verbose=0, max_restarts=1,
            restart_seeds=seeds, restart_jitter_rot=jitter_rot,
            restart_jitter_xyz=jitter_xyz,
        )

    plain = make_reg(seeds=1).run(xray_path, beta=1.0)
    # jitter far beyond the basin: the exact seed must still win (or a
    # jittered one must beat it) — never a regression
    wild = make_reg(seeds=3, jitter_rot=25.0, jitter_xyz=60.0).run(
        xray_path, beta=1.0
    )
    ncc_plain = plain[5]["trajectory"]["ncc"][-1]
    ncc_wild = wild[5]["trajectory"]["ncc"][-1]
    assert ncc_wild >= ncc_plain - 5e-3, (ncc_wild, ncc_plain)

    outdir = make_reg(seeds=3)(xray_path, tmp_path / "ms_bundle")
    import json

    meta = json.loads((outdir / "parameters.json").read_text())
    assert meta["optimization"]["restart_seeds"] == 3
    assert meta["optimization"]["restart_jitter_rot"] == 1.0
    assert meta["optimization"]["restart_jitter_xyz"] == 4.0


@pytest.mark.slow
def test_run_batch_shapes_and_bundles(phantom, gt_xray, tmp_path):
    """K=2 batched registration: per-image result tuples, per-image bundles."""
    xray_path, gt_pose = gt_xray
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=[np.pi, 0.0, 0.0], xyz=[0.0, 220.0, 0.0],
        linearize=False, scales="2", n_itrs="3",
        reverse_x_axis=False, verbose=0,
    )
    results = reg.run_batch([xray_path, xray_path], beta=1.0)
    assert len(results) == 2
    for gt, intrinsics, proj, init_pose, final_pose, kwargs in results:
        assert gt.shape == (1, 1, HEIGHT, HEIGHT)
        assert np.asarray(init_pose.matrix).shape == (1, 4, 4)
        assert np.asarray(final_pose.matrix).shape == (1, 4, 4)
        assert kwargs["batch_size"] == 2
        assert len(kwargs["trajectory"]["params"]) >= 2

    paths = reg.register_files([xray_path], tmp_path, max_batch=4)
    assert (paths[0] / "parameters.npz").exists()
    meta = (paths[0] / "parameters.json").read_text()
    assert '"type": "fixed"' in meta


def test_batched_rows_are_independent(phantom, gt_xray):
    """Duplicating one X-ray across a batch must give bitwise-identical rows:
    per-image losses, grads, and plateau states cannot couple."""
    xray_path, _ = gt_xray
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=[np.pi, 0.0, 0.0], xyz=[0.0, 220.0, 0.0],
        linearize=False, scales="2", n_itrs="5",
        reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
        max_n_plateaus=4, verbose=0,
    )
    a, b = reg.run_batch([xray_path, xray_path], beta=1.0)
    np.testing.assert_array_equal(np.asarray(a[4].matrix), np.asarray(b[4].matrix))
    np.testing.assert_array_equal(a[5]["trajectory"]["ncc"], b[5]["trajectory"]["ncc"])
    np.testing.assert_array_equal(a[5]["trajectory"]["params"], b[5]["trajectory"]["params"])


@pytest.mark.slow
def test_batched_matches_sequential(phantom, gt_xray, tmp_path):
    """A K=2 batched run must land where two K=1 runs land.

    Exact float equality is NOT expected: XLA fuses the K=1 and K=2
    executables differently, and the eps-floored local-NCC patches of a
    binary phantom amplify reassociation noise to the 1e-2 similarity level
    (verified: identical inputs give identical poses; a duplicated-image
    batch gives bitwise-equal rows — see test_batched_rows_are_independent).
    So assert the registration OUTCOME: both paths start from the same
    perturbed pose and must converge to the same ground truth."""
    from xvr_tpu.metrics import double_geodesic

    xray_path, gt_pose = gt_xray

    # a second, different X-ray from a second pose
    vol = read(phantom / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=HEIGHT, delx=DELX)
    pose_b = convert(
        jnp.array([[178.0, 3.0, -2.0]]), jnp.array([[-3.0, 225.0, 2.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(pose_b))[0, 0]
    img16 = (img / img.max() * 60000).astype(np.uint16)
    xray_b = phantom / "xray_b.dcm"
    dcmwrite(xray_b, img16, sdd=SDD, row_spacing=DELX, col_spacing=DELX)

    def make_reg(rot, xyz):
        return RegistrarFixed(
            volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
            rot=rot, xyz=xyz,
            linearize=False, scales="2,1", n_itrs="150,100",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            max_n_plateaus=4, verbose=0,
        )

    gt_poses = {str(xray_path): gt_pose, str(xray_b): pose_b}
    for p in (xray_path, xray_b):
        rot0, xyz0 = gt_poses[str(p)].convert("euler_angles", "ZXY")
        rot_init = (np.asarray(rot0)[0] + np.deg2rad([3.0, -2.0, 2.0])).tolist()
        xyz_init = (np.asarray(xyz0)[0] + np.array([6.0, -8.0, 5.0])).tolist()

        seq_out = make_reg(rot_init, xyz_init).run(p, beta=1.0)
        bat = make_reg(rot_init, xyz_init).run_batch([p, p], beta=1.0)

        # both paths must converge to an equally good registration. Pose
        # components are NOT the right observable here: single-view
        # registration leaves the (beta, tz) pair near-degenerate — a ~2.5
        # deg rotation compensated by depth renders near-identically — and
        # chaotic trajectories land at different spots along that valley.
        # The optimization contract is the image similarity.
        ncc_seq = seq_out[5]["trajectory"]["ncc"][-1]
        ncc_bat = bat[0][5]["trajectory"]["ncc"][-1]
        assert ncc_seq > 0.97, ncc_seq
        assert ncc_bat > 0.97, ncc_bat
        assert abs(ncc_seq - ncc_bat) < 0.02, (ncc_seq, ncc_bat)


@pytest.mark.slow
def test_register_files_groups_mixed_intrinsics(phantom, gt_xray, tmp_path):
    """Files with different detector geometry cannot share a batch: they
    split into intrinsics groups, and every file still gets a bundle."""
    xray_path, gt_pose = gt_xray
    # second X-ray at half resolution / different spacing
    vol = read(phantom / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=HEIGHT // 2, delx=2 * DELX)
    img = np.asarray(proj(gt_pose))[0, 0]
    small = phantom / "xray_small.dcm"
    dcmwrite(small, (img / img.max() * 60000).astype(np.uint16),
             sdd=SDD, row_spacing=2 * DELX, col_spacing=2 * DELX)

    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=[np.pi, 0.0, 0.0], xyz=[0.0, 220.0, 0.0],
        linearize=False, scales="2", n_itrs="2",
        reverse_x_axis=False, verbose=0,
    )
    # mixed batch must raise when forced through run_batch directly...
    with pytest.raises(ValueError, match="share intrinsics"):
        reg.run_batch([xray_path, small])
    # ...but register_files groups and completes
    paths = reg.register_files([xray_path, small], tmp_path)
    assert len(paths) == 2
    for p in paths:
        assert (p / "parameters.npz").exists()


@pytest.mark.slow
def test_registrar_siddon_exact_pins_xla_path(phantom, gt_xray, monkeypatch):
    """--renderer siddon_exact opts out of the kernel-upgrade block even when
    the fast path is forced: the registrar optimizes through the exact XLA
    Siddon (autodiff gradients) and still improves the objective."""
    monkeypatch.setenv("XVR_FORCE_SHEARWARP", "1")
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = (np.asarray(rot0)[0] + np.deg2rad([2.0, -1.5, 1.0])).tolist()
    xyz_init = (np.asarray(xyz0)[0] + np.array([4.0, -5.0, 3.0])).tolist()
    reg = RegistrarFixed(
        volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
        rot=rot_init, xyz=xyz_init, renderer="siddon_exact",
        linearize=False, scales="2", n_itrs="25",
        reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
        verbose=0, max_restarts=0,
    )
    out = reg.run(xray_path, beta=1.0)
    assert reg.renderer == "siddon_exact"
    assert reg.projector.renderer == "siddon", reg.projector.renderer
    ncc = out[5]["trajectory"]["ncc"]
    assert ncc[-1] > ncc[0]


@pytest.mark.slow
def test_siddon_fast_registration_accuracy(phantom, monkeypatch):
    """Bound what `--renderer siddon`'s quarter-voxel smoothing (the eps=0.25
    shear-warp trapezoid profile, render/shearwarp.py) costs in REGISTRATION
    accuracy, not just image error. Well-posed setup: the GT X-ray is
    rendered by the exact Siddon model itself, so the exact arm has zero
    model error and must converge tight; the fast arm's residual vs GT is
    then purely the smoothing bias, which is voxel-proportional (a transverse
    blur of ~eps/4 voxel). Both arms run the wide coarse-stage basin search
    (--coarse_seeds, the bench's production configuration) so the
    measurement isn't confounded by plateau-exit basin luck — without it the
    outcome is host-dependent (XLA CPU reassociates reductions differently
    across thread counts, and a marginal basin flips: measured 0.53/2.25 mm
    on a 1-core host vs sub-mm elsewhere). With the sweep the measured bias
    is ~0.05 voxel (~0.2 mm) on this deliberately harsh phantom — binary
    tissue, 4 mm voxels; at clinical voxel sizes (DeepFluoro ~0.75 mm) the
    same fraction vanishes below the sub-mm headline's noise floor.
    `--renderer siddon_exact` is the escape hatch when even that must be
    ruled out. XVR_FORCE_SHEARWARP exercises the production TPU selection
    path on CPU."""
    voxel = 4.0  # phantom spacing, mm
    vol0 = read(phantom / "ct.nii.gz")
    proj_gt = Projector.from_volume(
        vol0, sdd=SDD, height=HEIGHT, delx=DELX, renderer="siddon"
    )
    gt_pose = convert(
        jnp.array([[183.0, -2.0, 4.0]]), jnp.array([[2.0, 220.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj_gt(gt_pose))[0, 0]
    xray_path = phantom / "xray_siddon_gt.dcm"
    dcmwrite(
        xray_path, (img / img.max() * 60000).astype(np.uint16),
        sdd=SDD, row_spacing=DELX, col_spacing=DELX,
    )
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = (np.asarray(rot0)[0] + np.deg2rad([2.0, -1.5, 1.5])).tolist()
    xyz_init = (np.asarray(xyz0)[0] + np.array([5.0, -6.0, 4.0])).tolist()

    # fiducials: bone voxels of the phantom in world mm (affine = sp*I - c*sp)
    vol = read(phantom / "ct.nii.gz")
    hu = np.asarray(vol.data, np.float32)
    aff = np.asarray(vol.affine, np.float64)
    bone = np.argwhere(hu > 800)
    rng = np.random.default_rng(9)
    pick = bone[rng.choice(len(bone), 40, replace=False)].astype(np.float64)
    fids = pick @ aff[:3, :3].T + aff[:3, 3]

    def mtre(pose):
        M = np.asarray(pose.matrix, np.float64).reshape(4, 4)
        Gi = np.linalg.inv(np.asarray(gt_pose.matrix, np.float64)[0])
        a = fids @ Gi[:3, :3].T + Gi[:3, 3]
        Mi = np.linalg.inv(M)
        b = fids @ Mi[:3, :3].T + Mi[:3, 3]
        return float(np.linalg.norm(a - b, axis=-1).mean())

    def run(force_fast):
        if force_fast:
            monkeypatch.setenv("XVR_FORCE_SHEARWARP", "1")
        else:
            monkeypatch.delenv("XVR_FORCE_SHEARWARP", raising=False)
        reg = RegistrarFixed(
            volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
            rot=rot_init, xyz=xyz_init, renderer="siddon",
            linearize=False, scales="2,1", n_itrs="150,150",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=0.8,
            patience=10, max_n_plateaus=3, verbose=0, max_restarts=1,
            coarse_seeds=8,
        )
        out = reg.run(xray_path, beta=1.0)
        return out[4], reg  # final pose, registrar

    final_exact, reg_exact = run(False)
    assert not reg_exact.projector.renderer.endswith("_fast"), (
        reg_exact.projector.renderer
    )
    final_fast, reg_fast = run(True)
    assert reg_fast.projector.renderer == "siddon_fast", reg_fast.projector.renderer

    m_exact, m_fast = mtre(final_exact), mtre(final_fast)
    m_init = mtre(convert(
        jnp.asarray([rot_init], jnp.float32), jnp.asarray([xyz_init], jnp.float32),
        "euler_angles", "ZXY",
    ))
    print(f"mTRE init {m_init:.2f} mm -> exact {m_exact:.3f} / fast {m_fast:.3f}")
    # well-posed exact arm: no model error, must converge tight
    assert m_exact < 0.5, m_exact
    # fast arm: converges, and its residual stays within the smoothing's
    # voxel-proportional bias budget (0.4 voxel; ~0.05 voxel measured under
    # the coarse sweep — see the docstring; the budget keeps margin for the
    # host-thread-count sensitivity the sweep was added to tame)
    assert m_fast < m_init / 3
    assert m_fast <= m_exact + 0.4 * voxel, (m_fast, m_exact)


@pytest.mark.slow
def test_coarse_multistart_never_worse(phantom, gt_xray, tmp_path):
    """--coarse_seeds sweeps a wide jittered basin search through the
    COARSEST stage only, then continues the best restart_seeds starts through
    the full pyramid. Slot 0 always carries the unperturbed chain (stage
    output is argmax-tracked, so it can never score below its entry pose),
    hence the coarse-swept run can never end with a worse objective than the
    plain multi-start run; iters_run must account for the pre-pass."""
    xray_path, gt_pose = gt_xray
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = (np.asarray(rot0)[0] + np.deg2rad([3.0, -2.0, 2.0])).tolist()
    xyz_init = (np.asarray(xyz0)[0] + np.array([6.0, -8.0, 5.0])).tolist()

    def make_reg(coarse_seeds):
        return RegistrarFixed(
            volume=phantom / "ct.nii.gz", mask=None, orientation="AP",
            rot=rot_init, xyz=xyz_init,
            linearize=False, scales="2,1", n_itrs="40,30",
            reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
            patience=5, max_n_plateaus=2,
            restart_seeds=2, max_restarts=0,
            coarse_seeds=coarse_seeds, coarse_jitter_rot=4.0,
            coarse_jitter_xyz=12.0,
            verbose=0,
        )

    plain = make_reg(0).run(xray_path, beta=1.0)
    swept = make_reg(6).run(xray_path, beta=1.0)
    ncc_plain = plain[5]["trajectory"]["ncc"][-1]
    ncc_swept = swept[5]["trajectory"]["ncc"][-1]
    assert ncc_swept >= ncc_plain - 1e-3, (ncc_swept, ncc_plain)
    # the pre-pass iterations are paid wall time and must be accounted
    assert swept[5]["iters_run"] > plain[5]["iters_run"]
    # the bundle records the sweep configuration (replayability contract)
    import json as _json

    reg = make_reg(6)
    reg._stage_cache = {}  # fresh registrar, no state leakage
    path = reg(xray_path, tmp_path)
    meta = _json.loads((path / "parameters.json").read_text())
    assert meta["optimization"]["coarse_seeds"] == 6

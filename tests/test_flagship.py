"""The flagship closed loop: `xvr train` -> trained CNN -> `xvr register model`.

This is the reference's central workflow (reference cli/commands/register.py:228
feeding model/trainer.py:185-246 checkpoints into registrar/model.py:85-107):
train a patient-specific pose-regression CNN by rendering DRRs at random
poses, then use its single-forward-pass prediction as the initial pose for
test-time optimization. The test runs the REAL chain end to end on CPU — no
fixed perturbation stands in for the CNN — and pins that

* the CNN actually learns pose regression (init error orders of magnitude
  below an untrained net's, and inside the registration basin), and
* test-time optimization from the CNN init reaches sub-mm mTRE.

The TPU-scale mirror (256^3 CT, 1436^2 X-ray, reference budgets) is
``scripts/bench_flagship.py``, whose figures land in the bench artifact as
``register_model_{init,final}_mtre_mm``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import convert
from xvr_tpu.io import dcmwrite, save_nifti
from xvr_tpu.io.volumes import read
from xvr_tpu.render import Projector

SDD, HEIGHT, DELX = 400.0, 64, 3.0


@pytest.fixture(scope="module")
def flagship_setup(tmp_path_factory):
    """Phantom CT + ground-truth X-ray + bone fiducials for mTRE."""
    d = tmp_path_factory.mktemp("flagship")
    n, sp = 32, 4.0
    c = (n - 1) / 2
    X, Y, Z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= (n / 3) ** 2, 100.0, -1000.0).astype(np.float32)
    hu += np.where(r2 <= (n / 8) ** 2, 900.0, 0.0)
    # asymmetric markers at distinct depths/heights (break the beta/tz
    # near-degeneracy of single-view registration)
    hu[int(c) + 4 : int(c) + 8, int(c) - 2 : int(c) + 2, int(c) + 3 : int(c) + 9] = 1500.0
    hu[int(c) - 9 : int(c) - 5, int(c) + 3 : int(c) + 7, int(c) - 8 : int(c) - 4] = 1800.0
    hu[int(c) - 2 : int(c) + 2, int(c) - 8 : int(c) - 4, int(c) + 6 : int(c) + 10] = 1200.0
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(d / "ct.nii.gz", hu, aff)

    vol = read(d / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=HEIGHT, delx=DELX)
    gt_pose = convert(
        jnp.array([[183.0, -2.0, 4.0]]), jnp.array([[2.0, 220.0, -3.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(gt_pose))[0, 0]
    dcmwrite(
        d / "xray.dcm", (img / img.max() * 60000).astype(np.uint16),
        sdd=SDD, row_spacing=DELX, col_spacing=DELX,
    )

    bone = np.argwhere(hu > 600)
    frng = np.random.default_rng(7)
    fids = bone[frng.choice(len(bone), 40, replace=False)].astype(np.float64) * sp - c * sp
    return d, gt_pose, fids


def _mtre(pose, gt_pose, fids):
    M = np.asarray(pose.matrix, np.float64).reshape(4, 4)
    Mi = np.linalg.inv(M)
    Gi = np.linalg.inv(np.asarray(gt_pose.matrix, np.float64).reshape(4, 4))
    a = fids @ Gi[:3, :3].T + Gi[:3, 3]
    b = fids @ Mi[:3, :3].T + Mi[:3, 3]
    return float(np.linalg.norm(a - b, axis=-1).mean())


@pytest.mark.slow
def test_flagship_train_then_register_model(flagship_setup, tmp_path):
    """Train a tiny CNN for real (200 steps), checkpoint it, and register the
    X-ray with `register model` semantics: the CNN's predicted pose is the
    init, multiscale refinement must land sub-mm."""
    from xvr_tpu.registrar import RegistrarModel
    from xvr_tpu.train.trainer import Trainer

    d, gt_pose, fids = flagship_setup

    # pose ranges bracketing the GT (the patient-specific training recipe:
    # reference scripts/deepfluoro/train/finetune.sh samples around the
    # dataset's C-arm sweep); the CNN trains at HALF the X-ray resolution,
    # exercising predict_pose's intrinsics resample (model/inference.py:26-40)
    trainer = Trainer(
        volpath=d / "ct.nii.gz", maskpath=None, outpath=tmp_path / "ckpts",
        alphamin=173.0, alphamax=193.0, betamin=-12.0, betamax=8.0,
        gammamin=-6.0, gammamax=14.0, txmin=-8.0, txmax=12.0,
        tymin=200.0, tymax=240.0, tzmin=-13.0, tzmax=7.0,
        sdd=SDD, height=32, delx=6.0, model_name="resnet18",
        batch_size=8, n_total_itrs=200, n_warmup_itrs=10,
        n_grad_accum_itrs=1, n_save_every_itrs=1000, lr=3e-4,
    )
    first = {k: float(v) for k, v in jax.device_get(trainer.step(0)).items()}
    for i in range(1, 200):
        last = trainer.step(i)
    last = {k: float(v) for k, v in jax.device_get(last).items()}
    assert last["dgeo"] < first["dgeo"] / 3, (
        f"CNN did not learn: dgeo {first['dgeo']:.0f} -> {last['dgeo']:.0f} mm"
    )
    trainer._checkpoint(200)
    ckpt = sorted((tmp_path / "ckpts").glob("*.ckpt"))[-1]

    reg = RegistrarModel(
        ckptpath=ckpt, volume=d / "ct.nii.gz", mask=None,
        linearize=False, scales="2,1", n_itrs="150,150", crop=0,
        reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
        max_n_plateaus=4, verbose=0,
    )
    gt, intrinsics, proj, init_pose, final_pose, kwargs = reg.run(d / "xray.dcm")

    init_mtre = _mtre(init_pose, gt_pose, fids)
    final_mtre = _mtre(final_pose, gt_pose, fids)
    print(f"flagship: CNN init mTRE {init_mtre:.2f} mm -> final {final_mtre:.3f} mm")
    # an untrained net lands ~2,000 mm out (unit-conversion x1000 head);
    # 50 mm proves the CNN is the thing providing the init
    assert init_mtre < 50.0, f"CNN init outside plausible basin: {init_mtre:.1f} mm"
    assert init_mtre > 1.0, f"init suspiciously exact ({init_mtre:.2f} mm): not a real CNN test"
    assert final_mtre < 1.0, (
        f"flagship chain missed sub-mm: init {init_mtre:.2f} -> final {final_mtre:.3f} mm"
    )

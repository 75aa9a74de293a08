"""Foundation chain end to end (BASELINE config 5, VERDICT r4 #5).

The reference's foundation workflow: pretrain one pose-regression CNN over
MANY subjects (masked, patch-cropped volumes — reference
scripts/v1-submission/pelvis/train/patient_agnostic.sh, model/utils.py:59-93),
then warm-start a patient-specific finetune from that checkpoint
(reference scripts/deepfluoro/train/finetune.sh:12,33-40 passes ``-c``) on a
HELD-OUT subject with a small iteration budget. The promised payoff is that
the finetuned model reaches a useful init far faster than training de novo
at the same budget.

This test runs the whole chain for real at test scale and pins the payoff:

* pretrain on 2 phantom subjects (masked + random patch crops),
* finetune on a held-out third subject (weights-only warm start),
* train a de-novo control on the held-out subject at the SAME budget,
* the finetuned CNN's `register model` init must beat the de-novo init,
  and refinement from it must land sub-mm.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xvr_tpu.geometry import convert
from xvr_tpu.io import dcmwrite, save_nifti
from xvr_tpu.io.volumes import read
from xvr_tpu.render import Projector
from xvr_tpu.train.trainer import Trainer

SDD, HEIGHT, DELX = 400.0, 64, 3.0

# pose ranges bracketing the GT (same recipe as tests/test_flagship.py)
RANGES = dict(
    alphamin=173.0, alphamax=193.0, betamin=-12.0, betamax=8.0,
    gammamin=-6.0, gammamax=14.0, txmin=-8.0, txmax=12.0,
    tymin=200.0, tymax=240.0, tzmin=-13.0, tzmax=7.0,
)


def _make_subject(n: int, sp: float, r_frac: float, shifts) -> np.ndarray:
    """One member of the phantom family: sphere + bone core + 3 asymmetric
    markers whose positions vary per subject (correlated anatomy, not
    identical — what makes pretraining transfer without being a copy)."""
    c = (n - 1) / 2
    X, Y, Z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= (n * r_frac) ** 2, 100.0, -1000.0).astype(np.float32)
    hu += np.where(r2 <= (n / 8) ** 2, 900.0, 0.0)
    ci = int(c)
    (dx1, dz1), (dx2, dz2), (dy3, dz3) = shifts
    hu[ci + 4 + dx1 : ci + 8 + dx1, ci - 2 : ci + 2, ci + 3 + dz1 : ci + 9 + dz1] = 1500.0
    hu[ci - 9 + dx2 : ci - 5 + dx2, ci + 3 : ci + 7, ci - 8 + dz2 : ci - 4 + dz2] = 1800.0
    hu[ci - 2 : ci + 2, ci - 8 + dy3 : ci - 4 + dy3, ci + 6 + dz3 : ci + 10 + dz3] = 1200.0
    return hu


@pytest.fixture(scope="module")
def foundation_setup(tmp_path_factory):
    """2 pretraining subjects + 1 held-out subject (+ bone masks), and the
    held-out subject's ground-truth X-ray + fiducials."""
    d = tmp_path_factory.mktemp("foundation")
    n, sp = 32, 4.0
    c = (n - 1) / 2
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp

    (d / "vols").mkdir()
    (d / "masks").mkdir()
    family = {
        "a": (0.32, ((1, 0), (0, 1), (-1, 0))),
        "b": (0.34, ((-1, 1), (1, 0), (0, -1))),
    }
    for name, (rf, shifts) in family.items():
        hu = _make_subject(n, sp, rf, shifts)
        save_nifti(d / "vols" / f"{name}.nii.gz", hu, aff)
        save_nifti(
            d / "masks" / f"{name}.nii.gz",
            (hu > 600.0).astype(np.float32), aff,
        )

    # held-out subject: same family, its own marker layout
    hu_c = _make_subject(n, sp, 0.33, ((0, -1), (-1, 1), (1, 1)))
    save_nifti(d / "held_out.nii.gz", hu_c, aff)

    vol = read(d / "held_out.nii.gz")
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
    bone = np.argwhere(hu_c > 600)
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


def _train(volpath, outpath, n_itrs, seed=0, **kw):
    args = dict(
        volpath=volpath, maskpath=None, outpath=outpath,
        sdd=SDD, height=32, delx=6.0, model_name="resnet18",
        batch_size=8, n_total_itrs=n_itrs, n_warmup_itrs=10,
        n_grad_accum_itrs=1, n_save_every_itrs=10_000, lr=1e-3,
        seed=seed, **RANGES,
    )
    args.update(kw)
    tr = Trainer(**args)
    for i in range(tr.start_itr, n_itrs):
        last = tr.step(i)
    tr._checkpoint(n_itrs)
    return {k: float(v) for k, v in jax.device_get(last).items()}


def _init_mtre(ckptdir, setup):
    """`xvr register model --init_only` semantics: the CNN's predicted pose."""
    from xvr_tpu.registrar import RegistrarModel

    d, gt_pose, fids = setup
    ckpt = sorted(Path(ckptdir).glob("*.ckpt"))[-1]
    reg = RegistrarModel(
        ckptpath=ckpt, volume=d / "held_out.nii.gz", mask=None,
        linearize=False, scales="2,1", n_itrs="150,150", crop=0,
        reverse_x_axis=False, lr_rot=5e-3, lr_xyz=1.0,
        max_n_plateaus=4, verbose=0, init_only=True,
    )
    out = reg.run(d / "xray.dcm")
    init_pose = out[3]
    return _mtre(init_pose, gt_pose, fids), reg


@pytest.mark.slow
def test_foundation_pretrain_finetune_beats_de_novo(foundation_setup, tmp_path):
    d, gt_pose, fids = foundation_setup
    FINETUNE_ITRS = 50  # test-scale stand-in for the reference's 500

    # ---- foundation pretraining: 2 subjects, masked, random patch crops ----
    m_pre = _train(
        d / "vols", tmp_path / "pretrain", 200,
        maskpath=d / "masks", patch_size=(24, 24, 24), seed=11,
    )
    assert np.isfinite(m_pre["loss"])

    # ---- finetune on the HELD-OUT subject, warm-started (weights only) ----
    _train(
        d / "held_out.nii.gz", tmp_path / "finetune", FINETUNE_ITRS,
        ckptpath=tmp_path / "pretrain", reuse_optimizer=False, seed=22,
    )

    # ---- de-novo control at the SAME budget ----
    _train(
        d / "held_out.nii.gz", tmp_path / "de_novo", FINETUNE_ITRS, seed=22,
    )

    setup = (d, gt_pose, fids)
    init_ft, reg_ft = _init_mtre(tmp_path / "finetune", setup)
    init_dn, _ = _init_mtre(tmp_path / "de_novo", setup)
    print(
        f"foundation: finetuned init {init_ft:.1f} mm vs de-novo init "
        f"{init_dn:.1f} mm at {FINETUNE_ITRS} itrs"
    )
    # the payoff the foundation workflow exists for: at an equal (small)
    # finetune budget the pretrained warm start must land a clearly better
    # init (measured 34.9 vs 80.1 mm on the 1-core reference host; the 0.75
    # ratio keeps margin for XLA-CPU reduction-reassociation noise across
    # hosts — the same class of host sensitivity test_registrar's siddon
    # accuracy test documents)
    assert init_ft < 0.75 * init_dn, (init_ft, init_dn)
    assert init_ft < 50.0, f"finetuned init outside the basin: {init_ft:.1f} mm"

    # ---- and the finetuned init must carry a full registration to sub-mm --
    reg_ft.init_only = False
    out = reg_ft.run(d / "xray.dcm")
    final_mtre = _mtre(out[4], gt_pose, fids)
    print(f"foundation: finetuned init {init_ft:.1f} mm -> final {final_mtre:.3f} mm")
    assert final_mtre < 1.0, final_mtre

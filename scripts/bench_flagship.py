"""Flagship closed-loop benchmark: `xvr train` -> CNN -> `xvr register model`.

The reference's central workflow (reference cli/commands/register.py:228 +
model/trainer.py:185-246) executed END TO END at the reference operating
points: finetune a pose-regression CNN on the bench phantom (batch 116 DRRs @
128^2 against the 256^3 CT — scripts/deepfluoro/train/finetune.sh), write a
self-describing checkpoint, then register the 1436^2 phantom X-ray with
``RegistrarModel`` — the REAL ``predict_pose`` forward pass provides the
initial pose (no fixed perturbation stands in for the CNN) — at scales
24,12,6 x 500, crop 100.

Reports ``register_model_init_mtre_mm`` / ``register_model_final_mtre_mm``:
the model-initialized chain's accuracy, the number the reference's
"submillimeter" claim is about (reference README.md:20).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root
sys.path.insert(0, str(Path(__file__).resolve().parent))  # sibling bench_register


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(
    deadline: float | None = None,
    stage_cache: dict | None = None,
    min_itrs: int = 1000,
    max_itrs: int = 2000,
) -> dict:
    """Train for [min_itrs, max_itrs] iterations (deadline permitting), then
    register the phantom X-ray from the CNN's predicted pose.

    ``stage_cache`` lets the caller share compiled pyramid-stage executables
    with an earlier registration section (same scales/batch shape -> cache
    hits instead of ~20 s executable loads through a remote-TPU tunnel).
    """
    import jax

    import bench_register
    from xvr_tpu.registrar import RegistrarModel
    from xvr_tpu.train import Trainer

    log(f"device: {jax.devices()[0]}")
    d, meta = bench_register.build_phantom()

    def time_left():
        return np.inf if deadline is None else deadline - time.perf_counter()

    # ---- train: the finetune.sh operating point, pose ranges bracketing the
    # phantom's C-arm geometry (GT at alpha/beta/gamma = 182/-4/3 deg,
    # xyz = 6/740/-10 mm) with the +-15 deg / +-30 mm spread a patient-
    # specific sweep covers ----
    outdir = Path(tempfile.mkdtemp(prefix="xvr_bench_flagship_"))
    trainer = Trainer(
        volpath=d / "ct.nii.gz", maskpath=None, outpath=outdir,
        alphamin=167.0, alphamax=197.0, betamin=-19.0, betamax=11.0,
        gammamin=-12.0, gammamax=18.0, txmin=-24.0, txmax=36.0,
        tymin=710.0, tymax=770.0, tzmin=-40.0, tzmax=20.0,
        sdd=1020.0, height=128, delx=2.1764,
        model_name="resnet18",
        batch_size=116,
        n_total_itrs=max_itrs,
        n_warmup_itrs=10,
        n_grad_accum_itrs=4,
        n_save_every_itrs=1_000_000,
        lr=1e-3,
    )
    t0 = time.perf_counter()
    first = {k: float(v) for k, v in jax.device_get(trainer.step(0)).items()}
    jax.block_until_ready(trainer.params)
    compile_s = time.perf_counter() - t0
    log(f"flagship train: compile+first step {compile_s:.1f}s "
        f"({trainer.projectors[0][0].renderer}), dgeo {first['dgeo']:.1f} mm")

    # train in chunks; stop at max_itrs or when the deadline nears (reserve
    # time for the checkpoint + CNN-forward compile + registration — much
    # more when the pyramid-stage executables are NOT shared from an earlier
    # registration section: a cold registration costs ~125-300 s). The
    # deadline outranks min_itrs: a short-trained CNN still yields an honest
    # init figure, while an overshot global budget risks the driver's kill.
    RESERVE = 90.0 if stage_cache else 240.0
    itr, t_train0 = 1, time.perf_counter()
    step_s = None
    last = first
    while itr < max_itrs:
        chunk = min(250, max_itrs - itr)
        if step_s is not None and time_left() < chunk * step_s + RESERVE:
            if itr < min_itrs:
                log(f"flagship train: deadline before min_itrs "
                    f"({itr}/{min_itrs}) — stopping early to protect the "
                    f"registration reserve")
            break
        tc = time.perf_counter()
        for _ in range(chunk):
            m = trainer.step(itr)
            itr += 1
        jax.block_until_ready(trainer.params)
        step_s = (time.perf_counter() - tc) / chunk
        last = {k: float(v) for k, v in jax.device_get(m).items()}
        left = "inf" if deadline is None else f"{time_left():.0f}s"
        log(f"flagship train: itr {itr}, {step_s * 1e3:.1f} ms/step, "
            f"loss {last['loss']:.3f}, dgeo {last['dgeo']:.1f} mm, "
            f"{left} left")
    train_s = time.perf_counter() - t_train0
    trainer._checkpoint(itr)
    ckpt = sorted(outdir.glob("*.ckpt"))[-1]

    # ---- register model: CNN forward -> init pose -> multiscale refinement
    # at the reference budget (deepfluoro/register/finetuned.sh:30-38) ----
    reg = RegistrarModel(
        ckptpath=ckpt, volume=d / "ct.nii.gz", mask=None,
        linearize=False, scales="24,12,6", n_itrs="500,500,500", crop=100,
        reverse_x_axis=False, lr_rot=1e-2, lr_xyz=1.0,
        patience=10, max_n_plateaus=3, verbose=1,
        coarse_seeds=16,  # same engine config as bench_register -> shared stages
    )
    if stage_cache is not None:
        reg._stage_cache = stage_cache
    t0 = time.perf_counter()
    out = reg.run(d / "xray.dcm")
    register_s = time.perf_counter() - t0
    _, _, _, init_pose, final_pose, _ = out

    gt_M = np.asarray(meta["gt_pose"], np.float64).reshape(4, 4)
    fids = np.asarray(meta["fids"], np.float64)

    def mtre(pose):
        return bench_register.fiducial_mtre(pose.matrix, gt_M, fids)

    init_mtre, final_mtre = mtre(init_pose), mtre(final_pose)
    log(f"flagship: trained {itr} itrs in {train_s:.1f}s, CNN init mTRE "
        f"{init_mtre:.2f} mm -> final {final_mtre:.3f} mm ({register_s:.1f}s)")
    return {
        "metric": "flagship loop: train -> register model (256^3 CT, 1436^2 X-ray)",
        "train_itrs": itr,
        "train_s": round(train_s, 1),
        "train_compile_s": round(compile_s, 1),
        "train_step_ms": round((step_s or 0.0) * 1e3, 1),
        "train_final_dgeo_mm": round(last["dgeo"], 1),
        "register_s": round(register_s, 1),
        "init_mtre_mm": round(init_mtre, 3),
        "final_mtre_mm": round(final_mtre, 3),
        "stage_compiles": reg.stage_compiles,
    }


def main():
    from xvr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(json.dumps(run()))


if __name__ == "__main__":
    main()

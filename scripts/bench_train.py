"""Training-throughput benchmark (the reference's finetune config).

Runs the patient-specific finetune operating point from
/root/reference/scripts/deepfluoro/train/finetune.sh — batch 116 DRRs @
128^2 against a 256^3 CT, resnet34 backbone, grad-accum 4 — for a few dozen
steps on the local accelerator and reports steady-state s/iteration and the
projected wall time of the 500-iteration finetune budget (the reference's
"train a patient-specific model in 5 minutes" headline, README.md:10).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root (no pip install needed)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(n_windows: int = 3, n_steps: int = 12, deadline: float | None = None) -> dict:
    """Measure steady-state train-step time at the finetune operating point.

    Returns the JSON-ready dict; importable so the top-level bench.py can fold
    these numbers into the driver-recorded benchmark line. ``deadline`` is an
    absolute ``time.perf_counter()`` value; the masked (labelmap) phase is
    skipped when it is near — its compile is the expensive part.
    """
    import jax

    from xvr_tpu.io import save_nifti
    from xvr_tpu.train import Trainer

    log(f"device: {jax.devices()[0]}")
    d = Path(tempfile.mkdtemp(prefix="xvr_bench_train_"))

    # synthetic 256^3 CT: soft body + bone-density texture
    n, sp = 256, 1.5
    rng = np.random.default_rng(0)
    c = (n - 1) / 2
    X, Y, Z = np.meshgrid(*([np.arange(n, dtype=np.float32)] * 3), indexing="ij")
    body = ((X - c) / (0.45 * n)) ** 2 + ((Y - c) / (0.35 * n)) ** 2 + (
        (Z - c) / (0.4 * n)
    ) ** 2
    hu = np.where(body <= 1.0, 50.0, -1000.0).astype(np.float32)
    bone = rng.uniform(0.0, 1.0, hu.shape) > 0.995
    hu = np.where(bone & (body <= 0.8), 1200.0, hu)
    aff = np.eye(4, dtype=np.float32) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(d / "ct.nii.gz", hu, aff)

    # finetune.sh hyperparameters (batch 116, 128^2 @ 2.1764 mm, resnet34)
    trainer = Trainer(
        volpath=d / "ct.nii.gz",
        maskpath=None,
        outpath=d / "out",
        alphamin=135.0, alphamax=225.0, betamin=-30.0, betamax=30.0,
        gammamin=-15.0, gammamax=15.0,
        txmin=-150.0, txmax=150.0, tymin=450.0, tymax=1000.0,
        tzmin=-150.0, tzmax=150.0,
        sdd=1020.0, height=128, delx=2.1764,
        model_name="resnet34",
        batch_size=116,
        n_total_itrs=10 + n_windows * n_steps,
        n_warmup_itrs=10,
        n_grad_accum_itrs=4,
        n_save_every_itrs=10_000,
        lr=1e-3,
    )
    log(f"renderer: {trainer.projectors[0][0].renderer}")

    # compile + warm up (the tunneled chip runs fresh executables ~2x slow
    # for their first executions)
    t0 = time.perf_counter()
    trainer.step(0)
    import jax as _j

    _j.block_until_ready(trainer.params)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    for i in range(1, 8):
        trainer.step(i)
    _j.block_until_ready(trainer.params)

    best = np.inf
    for w in range(n_windows):
        t0 = time.perf_counter()
        for i in range(n_steps):
            m = trainer.step(8 + w * n_steps + i)
        _j.block_until_ready(trainer.params)
        dt = (time.perf_counter() - t0) / n_steps
        log(f"window {w}: {dt * 1e3:.0f} ms/step")
        best = min(best, dt)

    base_stats = {
        "metric": "train step (batch 116 DRRs @ 128^2, 256^3 CT, resnet34)",
        "value": round(best * 1e3, 1),
        "unit": "ms/step",
        "finetune_500_itrs_s": round(best * 500, 1),
        "drrs_per_sec_equiv": round(2 * 116 / best, 1),
        "renderer": trainer.projectors[0][0].renderer,
    }
    # The masked compile has cost up to ~125 s cold; bail out with the
    # unmasked figures if the budget can't cover it. Admission by MEASURED
    # prior (shared cost memo) when one exists: with the masked executable
    # in the persistent compile cache the phase costs a fraction of the
    # cold-sized 150 s guess, which otherwise starves it forever under the
    # driver's 130 s train slice (r05: the guess never fit; a standalone
    # `python scripts/bench_train.py` seeds the memo).
    from bench_register import _memo_load, _memo_store

    prior = _memo_load().get("train:masked_phase_s")
    need = prior * 1.3 if prior is not None else 150 + n_steps * best * 2
    if deadline is not None and deadline - time.perf_counter() < need:
        log(f"bench_train: skipping masked phase (deadline near: need {need:.0f}s)")
        return base_stats
    t_phase = time.perf_counter()

    # ---- masked (foundation) operating point: labelmap channel rendering +
    # Dice supervision (reference finetune scripts pass --maskpath; config 5
    # of BASELINE.json). Two bone labels; same batch/CNN budget.
    mask = np.zeros((n, n, n), dtype=np.int16)
    mask[n // 4 : n // 2, n // 4 : 3 * n // 4, n // 4 : 3 * n // 4] = 1
    mask[n // 2 : 3 * n // 4, n // 4 : 3 * n // 4, n // 4 : 3 * n // 4] = 2
    save_nifti(d / "mask.nii.gz", mask.astype(np.float32), aff)
    trainer_m = Trainer(
        volpath=d / "ct.nii.gz",
        maskpath=d / "mask.nii.gz",
        outpath=d / "out_masked",
        alphamin=135.0, alphamax=225.0, betamin=-30.0, betamax=30.0,
        gammamin=-15.0, gammamax=15.0,
        txmin=-150.0, txmax=150.0, tymin=450.0, tymax=1000.0,
        tzmin=-150.0, tzmax=150.0,
        sdd=1020.0, height=128, delx=2.1764,
        model_name="resnet34",
        batch_size=116,
        n_total_itrs=10 + n_steps,
        n_warmup_itrs=10,
        n_grad_accum_itrs=4,
        n_save_every_itrs=10_000,
        lr=1e-3,
    )
    t0 = time.perf_counter()
    trainer_m.step(0)
    _j.block_until_ready(trainer_m.params)
    log(f"masked compile+first step: {time.perf_counter() - t0:.1f}s "
        f"({trainer_m.projectors[0][0].renderer})")
    for i in range(1, 6):
        trainer_m.step(i)
    _j.block_until_ready(trainer_m.params)
    t0 = time.perf_counter()
    for i in range(n_steps):
        trainer_m.step(6 + i)
    _j.block_until_ready(trainer_m.params)
    masked_ms = (time.perf_counter() - t0) / n_steps * 1e3
    log(f"masked step: {masked_ms:.0f} ms ({trainer_m.projectors[0][0].renderer})")
    _memo_store(**{"train:masked_phase_s": round(time.perf_counter() - t_phase, 1)})

    return {
        **base_stats,
        "masked_step_ms": round(masked_ms, 1),
        "masked_renderer": trainer_m.projectors[0][0].renderer,
    }


def main():
    from xvr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # bench.py does this for the in-process path
    print(json.dumps(run()))


if __name__ == "__main__":
    main()

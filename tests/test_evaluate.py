"""End-to-end test of the benchmark evaluator script (scripts/evaluate.py)."""

import importlib.util
import json
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from xvr_tpu.geometry import convert
from xvr_tpu.io import save_nifti

REPO = Path(__file__).resolve().parents[1]


def _load_evaluate():
    spec = importlib.util.spec_from_file_location("evaluate", REPO / "scripts" / "evaluate.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["evaluate"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_evaluate_script_end_to_end(tmp_path):
    data = tmp_path / "data" / "femur" / "subject01"
    (data / "xrays").mkdir(parents=True)

    n, c, sp = 24, 11.5, 4.0
    idx = np.arange(n)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= 8**2, 500.0, -1000.0).astype(np.float32)
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(data / "volume.nii.gz", hu, aff)
    np.save(data / "fiducials.npy", np.array([[0.0, 0.0, 0.0], [10.0, -5.0, 8.0]], np.float32))

    gt_pose = convert(
        jnp.asarray([[180.0, 2.0, -1.0]]), jnp.asarray([[3.0, 220.0, -2.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    np.savez(
        data / "xrays" / "x1.npz",
        pose=np.asarray(gt_pose.matrix)[0],
        intrinsics_sdd=400.0, intrinsics_height=64, intrinsics_width=64,
        intrinsics_delx=4.0, intrinsics_dely=4.0, intrinsics_x0=0.0, intrinsics_y0=0.0,
    )

    # a "registration result": init 5 mm / 2 deg off; final = truth
    off = convert(
        jnp.asarray([[182.0, 2.0, -1.0]]), jnp.asarray([[3.0, 225.0, -2.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    res = tmp_path / "results" / "femur" / "subject01" / "x1"
    res.mkdir(parents=True)
    np.savez(
        res / "parameters.npz",
        init_pose=np.asarray(off.matrix), final_pose=np.asarray(gt_pose.matrix),
        trajectory_ncc=np.asarray([0.5, 0.99]),
    )
    (res / "parameters.json").write_text(json.dumps({"runtime": 1.25}))

    mod = _load_evaluate()
    from click.testing import CliRunner

    out_csv = tmp_path / "scores.csv"
    r = CliRunner().invoke(
        mod.main,
        ["-f", str(tmp_path / "results"), "-s", str(out_csv), "-d", str(tmp_path / "data")],
    )
    assert r.exit_code == 0, r.output
    lines = out_csv.read_text().strip().splitlines()
    assert len(lines) == 2
    header = lines[0].split(",")
    row = dict(zip(header, lines[1].split(",")))
    assert row["subject"] == "subject01" and row["xray"] == "x1"
    assert float(row["mtre_init"]) > 1.0  # init is off
    assert float(row["mtre"]) < 1e-2  # final == truth
    assert float(row["runtime"]) == 1.25


def test_process_filenames_layouts(tmp_path):
    """Path inference for result bundles (reference evaluate.py:86-108):
    dataset/subject/xray, partition prefixes, and checkpoint-epoch sweeps
    (subject/epoch/xray)."""
    mod = _load_evaluate()
    root = tmp_path / "results"
    paths = [
        root / "deepfluoro" / "subject01" / "xray0" / "parameters.npz",
        root / "finetune" / "ljubljana" / "subject02" / "frontal" / "parameters.npz",
        root / "deepfluoro" / "subject03" / "0250" / "xray7" / "parameters.npz",
    ]
    for p in paths:
        p.parent.mkdir(parents=True)
        p.touch()
    rows = mod.process_filenames(sorted(paths), root)
    by_subject = {r[3]: r for r in rows}

    _, dataset, partition, subject, epoch, xray = by_subject["subject01"]
    assert (dataset, epoch, xray) == ("deepfluoro", None, "xray0")

    _, dataset, partition, subject, epoch, xray = by_subject["subject02"]
    assert dataset == "ljubljana" and xray == "frontal"
    assert "finetune" in partition

    _, dataset, partition, subject, epoch, xray = by_subject["subject03"]
    assert (dataset, epoch, xray) == ("deepfluoro", "0250", "xray7")

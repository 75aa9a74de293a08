"""Benchmark evaluator: score saved registrations against ground-truth poses.

Semantics of /root/reference/scripts/evaluate.py:13-188: walk a results tree
for ``parameters.npz`` bundles, reconstruct each dataset's ground-truth pose
(including the DeepFluoro axis-flip mapper), evaluate
mPE/mRPE/mTRE/double-geodesic for the initial and final poses, and write a
CSV.

Ground truth layout (produced by scripts/convert_datasets.py):
  data/<dataset>/<subject>/volume.nii.gz [+ mask.nii.gz, fiducials.npy]
  data/<dataset>/<subject>/xrays/<xray>.npz  (keys: pose, intrinsics_*)
Results layout (produced by `xvr register`):
  <filepath>/.../<subject>/.../<xray>/parameters.npz
"""

from __future__ import annotations

import json
from pathlib import Path

import click
import numpy as np


def initialize_evaluator(dataset, subject, intrinsics, data_root, voxel_shift=0.0):
    import jax.numpy as jnp

    from xvr_tpu.io.volumes import read
    from xvr_tpu.metrics import Evaluator
    from xvr_tpu.render.projector import Projector

    root = Path(data_root) / dataset / subject
    mask = root / "mask.nii.gz"
    vol = read(root / "volume.nii.gz", mask if mask.exists() else None, orientation="AP")
    proj = Projector.from_volume(
        vol,
        sdd=float(intrinsics["sdd"]),
        height=int(intrinsics["height"]),
        width=int(intrinsics["width"]),
        delx=float(intrinsics["delx"]),
        dely=float(intrinsics["dely"]),
        x0=float(intrinsics.get("x0", 0.0)),
        y0=float(intrinsics.get("y0", 0.0)),
        voxel_shift=voxel_shift,
    )
    fiducials = jnp.asarray(np.load(root / "fiducials.npy"))
    if fiducials.ndim == 2:
        fiducials = fiducials[None]
    return Evaluator(proj, fiducials)


_DEEPFLUORO_MAPPER = np.diag([-1.0, -1.0, 1.0, 1.0]).astype(np.float32)


def read_true(dataset, subject, xray, data_root):
    from xvr_tpu.geometry import RigidTransform

    import jax.numpy as jnp

    f = np.load(Path(data_root) / dataset / subject / "xrays" / f"{xray}.npz")
    pose = np.asarray(f["pose"], dtype=np.float32)
    if pose.ndim == 2:
        pose = pose[None]
    if dataset == "deepfluoro":
        # axis-flip mapper applied after the recorded pose (evaluate.py:49-62)
        pose = _DEEPFLUORO_MAPPER @ pose
    intrinsics = {
        k.removeprefix("intrinsics_"): float(f[k])
        for k in f.files
        if k.startswith("intrinsics_")
    }
    return RigidTransform(jnp.asarray(pose)), intrinsics


def read_pred(filename: Path):
    from xvr_tpu.geometry import RigidTransform

    import jax.numpy as jnp

    d = np.load(filename)
    init_pose = RigidTransform(jnp.asarray(d["init_pose"]))
    final_pose = ncc_init = ncc_final = runtime = None
    if "final_pose" in d.files:
        final_pose = RigidTransform(jnp.asarray(d["final_pose"]))
        ncc = d.get("trajectory_ncc")
        if ncc is not None and len(ncc):
            ncc_init, ncc_final = float(ncc[0]), float(ncc[-1])
        meta_path = filename.parent / "parameters.json"
        if meta_path.exists():
            runtime = json.loads(meta_path.read_text()).get("runtime")
    return init_pose, ncc_init, final_pose, ncc_final, runtime


def process_filenames(filenames, results_root):
    """Infer (dataset, partition, subject, epoch, xray) from result paths."""
    rows = []
    for filename in filenames:
        rel = filename.parent.relative_to(results_root)
        parts = list(rel.parts)
        xray = parts[-1]
        subject = next((p for p in parts if p.startswith("subject")), parts[0])
        dataset = next(
            (p for p in parts if p in ("deepfluoro", "ljubljana", "femur")), "unknown"
        )
        sidx = parts.index(subject)
        partition = "-".join(parts[:sidx]) or "results"
        epoch = parts[sidx + 1] if len(parts) > sidx + 2 else None
        rows.append((filename, dataset, partition, subject, epoch, xray))
    return sorted(rows, key=lambda r: (r[1], r[3], r[5]))


@click.command()
@click.option("-f", "--filepath", type=click.Path(exists=True), required=True)
@click.option("-s", "--savepath", type=click.Path(), required=True)
@click.option("-d", "--data-root", type=click.Path(exists=True), default="data")
def main(filepath, savepath, data_root):
    import jax

    jax.config.update("jax_platforms", "cpu")

    filenames = sorted(Path(filepath).rglob("parameters.npz"))
    rows = process_filenames(filenames, Path(filepath))

    out = []
    cache_key, evaluator = None, None
    for filename, dataset, partition, subject, epoch, xray in rows:
        try:
            true_pose, intrinsics = read_true(dataset, subject, xray, data_root)
        except FileNotFoundError:
            print(f"! no ground truth for {dataset}/{subject}/{xray}, skipping")
            continue
        key = (dataset, subject)
        if key != cache_key:
            evaluator = initialize_evaluator(dataset, subject, intrinsics, data_root)
            cache_key = key
        init_pose, ncc_i, final_pose, ncc_f, runtime = read_pred(filename)
        m_init = np.asarray(evaluator(true_pose, init_pose)).reshape(-1)
        rec = dict(
            dataset=dataset, partition=partition, subject=subject, epoch=epoch,
            xray=xray, mpe_init=m_init[0], mrpe_init=m_init[1],
            mtre_init=m_init[2], dgeo_init=m_init[3], ncc_init=ncc_i,
        )
        if final_pose is not None:
            m_fin = np.asarray(evaluator(true_pose, final_pose)).reshape(-1)
            rec.update(
                mpe=m_fin[0], mrpe=m_fin[1], mtre=m_fin[2], dgeo=m_fin[3],
                ncc=ncc_f, runtime=runtime,
            )
        out.append(rec)
        print(f"{dataset}/{subject}/{xray}: mTRE {rec.get('mtre', rec['mtre_init']):.2f} mm")

    if not out:
        print("No results evaluated.")
        return
    cols = sorted({k for r in out for k in r})
    with open(savepath, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in out:
            f.write(",".join(str(r.get(c, "")) for c in cols) + "\n")
    print(f"Wrote {len(out)} rows to {savepath}")


if __name__ == "__main__":
    main()

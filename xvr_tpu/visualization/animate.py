"""Re-render a saved optimization trajectory to video.

Semantics of /root/reference/src/xvr/visualization/animate.py:17-106: reload
the self-describing result bundle, rebuild the projector from its config, walk
the trajectory rows re-rendering each recorded pose (advancing the multiscale
pyramid where the recorded learning rate jumps back up = a stage boundary),
and write the frames to a video via imageio.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry import convert
from ..io.volumes import read
from ..io.xray import read_xray
from ..registrar.base import _parse_scales
from ..render.projector import Projector
from ..utils.transforms import make_xray_transforms


def load_bundle(inpath):
    inpath = Path(inpath)
    if inpath.is_dir():
        npz, meta = inpath / "parameters.npz", inpath / "parameters.json"
    else:
        npz, meta = inpath, inpath.parent / "parameters.json"
    arrays = dict(np.load(npz))
    meta = json.loads(meta.read_text())
    return arrays, meta


def rebuild_projector(meta) -> Projector:
    drr = meta["drr"]
    vol = read(
        drr["volume"], drr.get("mask"), labels=drr.get("labels"),
        orientation=drr.get("orientation"),
    )
    return Projector.from_volume(
        vol,
        sdd=drr["sdd"], height=int(drr["height"]), delx=drr["delx"],
        width=int(drr["width"]), dely=drr["dely"], x0=drr["x0"], y0=drr["y0"],
        reverse_x_axis=drr["reverse_x_axis"], renderer=drr["renderer"],
        voxel_shift=drr.get("drr_kwargs", {}).get("voxel_shift", 0.0),
    )


def animate(inpath, outpath, skip: int = 1, dpi: int = 192, fps: int = 30):
    import imageio.v3 as iio
    import matplotlib.pyplot as plt

    arrays, meta = load_bundle(inpath)
    projector = rebuild_projector(meta)

    xray_meta = meta["xray"]
    gt, *_ = read_xray(
        xray_meta["filename"],
        crop=int(xray_meta["crop"]),
        subtract_background=bool(xray_meta["subtract_background"]),
        linearize=bool(xray_meta["linearize"]),
        reducefn=xray_meta["reducefn"],
    )

    params = arrays["trajectory_params"]  # (T, 6) euler ZXY (rad) + xyz (mm)
    lrs = arrays["trajectory_lrs"]
    scales = _parse_scales(
        [str(s) for s in meta["optimization"]["scales"]],
        int(xray_meta["crop"]),
        int(meta["drr"]["height"]),
    )

    # stage boundaries: recorded lr jumping UP = new pyramid stage
    stage_idx = 0
    proj_stage = projector.rescale_detector(scales[0])
    frames = []
    prev_lr = np.inf
    for t in range(0, len(params), skip):
        lr = lrs[min(t, len(lrs) - 1), 0]
        if lr > prev_lr and stage_idx + 1 < len(scales):
            stage_idx += 1
            proj_stage = projector.rescale_detector(scales[stage_idx])
        prev_lr = lr

        pose = convert(
            jnp.asarray(params[t, :3], dtype=jnp.float32)[None],
            jnp.asarray(params[t, 3:], dtype=jnp.float32)[None],
            parameterization="euler_angles", convention="ZXY",
        )
        img = np.asarray(proj_stage(pose))[0, 0]
        tr = make_xray_transforms(img.shape[0], img.shape[1])
        gt_small = np.asarray(tr(jnp.asarray(gt)))[0, 0]

        fig, axs = plt.subplots(ncols=2, figsize=(6, 3), dpi=dpi)
        for ax, im, name in zip(axs, [img, gt_small], [f"DRR (itr {t})", "X-ray"]):
            ax.imshow(im, cmap="gray")
            ax.set_title(name)
            ax.set_xticks([]); ax.set_yticks([])
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(frame)
        plt.close(fig)

    outpath = Path(outpath)
    outpath.parent.mkdir(parents=True, exist_ok=True)
    stack = np.stack(frames)
    try:
        iio.imwrite(outpath, stack, fps=fps)
    except (OSError, TypeError):
        if outpath.suffix == ".gif":
            raise
        # no video backend (imageio-ffmpeg/pyav not installed): fall back to
        # an animated GIF next to the requested path
        outpath = outpath.with_suffix(".gif")
        iio.imwrite(outpath, stack, duration=1000.0 / fps, loop=0)
        print(f"No video backend for {fps} fps video; wrote {outpath}", flush=True)
    return outpath

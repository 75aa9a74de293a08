"""Projector construction facade.

API parity with /root/reference/src/xvr/renderer/load.py:5-43
(``initialize_drr``): load a CT (+ optional labelmap restricted to chosen
labels), then build a renderer at the given intrinsics.
"""

from __future__ import annotations

from .projector import Projector


def initialize_drr(
    volume,
    mask,
    labels,
    orientation,
    height,
    width,
    sdd,
    delx,
    dely,
    x0,
    y0,
    reverse_x_axis,
    renderer,
    read_kwargs=None,
    drr_kwargs=None,
    device=None,  # accepted for signature parity; placement is managed by JAX
) -> Projector:
    from ..io.volumes import read  # deferred: io.volumes itself imports render

    vol = read(volume, mask, labels=labels, orientation=orientation, **(read_kwargs or {}))
    drr_kwargs = dict(drr_kwargs or {})
    # labels act at READ level ("exclusively render these structures": the
    # density outside them becomes air) — the projector itself renders a
    # single image, like the reference's DRR module; channel rendering is
    # requested separately via Projector(labels=...) in the trainer.
    return Projector.from_volume(
        vol,
        sdd=sdd,
        height=height,
        width=width,
        delx=delx,
        dely=dely,
        x0=x0,
        y0=y0,
        reverse_x_axis=reverse_x_axis,
        renderer=renderer,
        labels=None,
        voxel_shift=drr_kwargs.get("voxel_shift", 0.0),
    )

"""Registrar initialized by a pretrained pose-regression CNN.

Semantics of /root/reference/src/xvr/registrar/model.py:8-107.
"""

from __future__ import annotations

from ..io.xray import read_xray
from ..models.inference import construct_antipode, correct_pose, predict_pose
from ..models.regressor import load_model
from .base import RegistrarBase


class RegistrarModel(RegistrarBase):
    def __init__(
        self,
        volume,
        mask,
        ckptpath,
        labels=None,
        crop=0,
        subtract_background=False,
        linearize=True,
        equalize=False,
        reducefn="max",
        warp=None,
        invert=False,
        antipodal=False,
        scales="8",
        n_itrs="100",
        reverse_x_axis=True,
        renderer="trilinear",
        parameterization="euler_angles",
        convention="ZXY",
        voxel_shift=0.0,
        lr_rot=1e-2,
        lr_xyz=1e0,
        patience=10,
        threshold=1e-4,
        max_n_plateaus=3,
        init_only=False,
        saveimg=False,
        verbose=1,
        read_kwargs=None,
        drr_kwargs=None,
    ):
        self.ckptpath = ckptpath
        self.model, self.params, self.config, self.date = load_model(ckptpath, meta=True)
        self.warp = warp
        self.invert = invert
        self.antipodal = antipodal

        super().__init__(
            volume, mask, self.config["orientation"], labels, crop,
            subtract_background, linearize, equalize, reducefn, scales, n_itrs,
            reverse_x_axis, renderer, parameterization, convention, voxel_shift,
            lr_rot, lr_xyz, patience, threshold, max_n_plateaus, init_only,
            saveimg, verbose, read_kwargs, drr_kwargs,
            save_kwargs={
                "type": "model",
                "ckptpath": str(ckptpath),
                "date": self.date,
                "warp": str(warp) if warp is not None else None,
                "invert": invert,
            },
        )

    def initialize_pose(self, i2d, return_resampled: bool = False):
        gt, sdd, delx, dely, x0, y0, pf_to_af = read_xray(
            i2d, self.crop, self.subtract_background, self.linearize, self.reducefn
        )
        init_pose, resampled_gt = predict_pose(
            self.model, self.params, self.config, gt, sdd, delx, dely, x0, y0
        )
        init_pose = correct_pose(init_pose, self.warp, self.volume, self.invert)
        if self.antipodal:
            init_pose = construct_antipode(init_pose)
        if return_resampled:
            return gt, sdd, delx, dely, x0, y0, pf_to_af, init_pose, resampled_gt
        return gt, sdd, delx, dely, x0, y0, pf_to_af, init_pose

"""Registrar initialized from a previous run's final pose
(/root/reference/src/xvr/registrar/restart.py:8-74)."""

from __future__ import annotations

from ..geometry import RigidTransform
from ..io.xray import read_xray
from .base import RegistrarBase


class RegistrarRestart(RegistrarBase):
    def __init__(
        self,
        volume,
        mask,
        orientation,
        init_pose: RigidTransform,
        labels=None,
        reducefn="max",
        crop=0,
        subtract_background=False,
        linearize=True,
        equalize=False,
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
        super().__init__(
            volume, mask, orientation, labels, crop, subtract_background,
            linearize, equalize, reducefn, scales, n_itrs, reverse_x_axis,
            renderer, parameterization, convention, voxel_shift, lr_rot, lr_xyz,
            patience, threshold, max_n_plateaus, init_only, saveimg, verbose,
            read_kwargs, drr_kwargs, save_kwargs={"type": "restart"},
        )
        self.init_pose = init_pose

    def initialize_pose(self, i2d):
        gt, sdd, delx, dely, x0, y0, pf_to_af = read_xray(
            i2d, self.crop, self.subtract_background, self.linearize, self.reducefn
        )
        return gt, sdd, delx, dely, x0, y0, pf_to_af, self.init_pose

"""Initial pose supplied directly by the user.

Useful when the acquisition geometry is known a priori (a standard AP shot,
say) or when scripting sweeps over hand-picked starting poses. The rotation
components are interpreted in the registrar's own parameterization/convention.
Reference surface: /root/reference/src/xvr/registrar/fixed.py:8-81.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import convert
from ..io.xray import read_xray
from .base import RegistrarBase, clinical_defaults


class RegistrarFixed(RegistrarBase):
    def __init__(self, volume, mask, orientation, rot, xyz, **kwargs):
        super().__init__(
            volume, mask, orientation,
            save_kwargs={"type": "fixed"},
            **clinical_defaults(kwargs),
        )
        self.init_pose = convert(
            jnp.asarray([rot], dtype=jnp.float32),
            jnp.asarray([xyz], dtype=jnp.float32),
            parameterization=self.parameterization,
            convention=self.convention,
        )

    def initialize_pose(self, i2d):
        xray = read_xray(
            i2d, self.crop, self.subtract_background, self.linearize, self.reducefn
        )
        return (*xray, self.init_pose)

"""Registration module: a pose parameterized for gradient optimization.

API-parity replacement for ``diffdrr.registration.Registration``
(/root/reference/src/xvr/registrar/base.py:11,168-169): holds learnable
(rotation, translation) leaves in a chosen parameterization; calling it
renders the projector at the current pose.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import RigidTransform, convert
from ..render.projector import Projector


class Registration:
    def __init__(
        self,
        projector: Projector,
        rotation: jnp.ndarray,
        translation: jnp.ndarray,
        parameterization: str = "euler_angles",
        convention: str | None = "ZXY",
    ):
        self.projector = projector
        self.rotation = jnp.asarray(rotation)
        self.translation = jnp.asarray(translation)
        self.parameterization = parameterization
        self.convention = convention

    @property
    def pose(self) -> RigidTransform:
        return convert(
            self.rotation,
            self.translation,
            parameterization=self.parameterization,
            convention=self.convention,
        )

    def __call__(self, density=None) -> jnp.ndarray:
        return self.projector(self.pose, density=density)

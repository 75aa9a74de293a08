"""Registration module: a pose parameterized for gradient optimization.

COMPAT-ONLY public API: a drop-in replacement for
``diffdrr.registration.Registration`` (/root/reference/src/xvr/registrar/
base.py:11,168-169) for users porting notebook/script code from the
reference stack. The registration ENGINE does not route through this class —
its per-stage ``lax.while_loop`` keeps (rotation, translation) as plain
arrays in the optimizer state (xvr_tpu/registrar/base.py:_make_stage), which
is the jit-friendly form of the same computation.
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

"""Registration error metrics (all in mm).

Semantics of /root/reference/src/xvr/metrics/evaluator.py:7-36: mean projection
error (mPE, detector-plane distance of projected fiducials), mean reprojection
error (mRPE, 3D distance between detector-plane backprojections), mean target
registration error (mTRE, 3D fiducial distance), and the double geodesic.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import RigidTransform
from ..render.projector import Projector
from .geodesic import double_geodesic


class Evaluator:
    """Callable computing (mpe, mrpe, mtre, dgeo) for pose pairs.

    ``fiducials``: (1, N, 3) ground-truth landmark positions in world mm.
    """

    def __init__(self, projector: Projector, fiducials: jnp.ndarray):
        self.projector = projector
        self.fiducials = jnp.asarray(fiducials)

    def __call__(self, true_pose: RigidTransform, pred_pose: RigidTransform):
        det = self.projector.detector
        x = self.projector.perspective_projection(pred_pose, self.fiducials)
        y = self.projector.perspective_projection(true_pose, self.fiducials)
        mpe = jnp.mean(jnp.linalg.norm(det.delx * (x - y), axis=-1), axis=-1)

        x3 = self.projector.inverse_projection(pred_pose, x)
        y3 = self.projector.inverse_projection(true_pose, y)
        mrpe = jnp.mean(jnp.linalg.norm(x3 - y3, axis=-1), axis=-1)

        xw = pred_pose(self.fiducials)
        yw = true_pose(self.fiducials)
        mtre = jnp.mean(jnp.linalg.norm(xw - yw, axis=-1), axis=-1)

        *_, dgeo = double_geodesic(true_pose, pred_pose, det.sdd, eps=1e-7)
        return jnp.stack(
            [jnp.squeeze(mpe), jnp.squeeze(mrpe), jnp.squeeze(mtre), jnp.squeeze(dgeo)],
            axis=-1,
        )

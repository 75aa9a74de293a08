"""Random 6-DoF pose sampling for training.

Semantics of /root/reference/src/xvr/model/sampler.py:5-38: uniform sampling
within user ranges; angles are wrapped to (-180, 180] ("circle_shift"); the
rotation is intrinsic ZXY Euler in degrees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import RigidTransform, convert


def _uniform(key, low, high, n, circle_shift=False):
    x = jax.random.uniform(key, (n,), minval=low, maxval=high)
    if circle_shift:
        x = ((x + 180.0) % 360.0) - 180.0
    return x


def get_random_pose(
    key: jax.Array,
    alphamin: float, alphamax: float,
    betamin: float, betamax: float,
    gammamin: float, gammamax: float,
    txmin: float, txmax: float,
    tymin: float, tymax: float,
    tzmin: float, tzmax: float,
    batch_size: int,
) -> RigidTransform:
    ka, kb, kg, kx, ky, kz = jax.random.split(key, 6)
    alpha = _uniform(ka, alphamin, alphamax, batch_size, circle_shift=True)
    beta = _uniform(kb, betamin, betamax, batch_size, circle_shift=True)
    gamma = _uniform(kg, gammamin, gammamax, batch_size, circle_shift=True)
    tx = _uniform(kx, txmin, txmax, batch_size)
    ty = _uniform(ky, tymin, tymax, batch_size)
    tz = _uniform(kz, tzmin, tzmax, batch_size)
    rot = jnp.stack([alpha, beta, gamma], axis=1)
    xyz = jnp.stack([tx, ty, tz], axis=1)
    return convert(rot, xyz, parameterization="euler_angles", convention="ZXY", degrees=True)

"""Geodesic distances on SO(3)/SE(3).

Replaces ``diffdrr.metrics.DoubleGeodesicSE3(sdd, eps)`` (call sites:
/root/reference/src/xvr/model/loss.py:18, metrics/evaluator.py:15). The
rotation geodesic is converted from radians to millimetres with the focal
length ``sdd`` (arc length at the detector); the translation geodesic is the
Euclidean distance; the "double geodesic" combines them in quadrature.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry.se3 import RigidTransform


def so3_angle(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Rotation angle (radians) between two rotation-matrix batches.

    Uses ``||R1 - R2||_F = 2 sqrt(2) |sin(theta/2)|``, which (unlike the
    arccos-of-trace form) is exact at theta = 0 and has stable gradients
    there; ``eps`` only guards the arcsin argument near theta = pi.
    """
    ss = jnp.sum((R1 - R2) ** 2, axis=(-2, -1))
    small = ss < 1e-24
    d = jnp.sqrt(jnp.where(small, 1.0, ss))
    arg = jnp.clip(d / (2.0 * jnp.sqrt(2.0)), 0.0, 1.0 - eps)
    return jnp.where(small, 0.0, 2.0 * jnp.arcsin(arg))


def double_geodesic(
    pose1: RigidTransform,
    pose2: RigidTransform,
    sdd: float,
    eps: float = 1e-6,
):
    """-> (rot_geo_mm, trans_geo_mm, double_geo_mm), each (...,)."""
    rgeo = sdd * so3_angle(pose1.R, pose2.R, eps)
    tgeo = jnp.linalg.norm(pose1.t - pose2.t, axis=-1)
    dgeo = jnp.sqrt(rgeo**2 + tgeo**2)
    return rgeo, tgeo, dgeo

"""SO(3) rotation parameterizations and conversions, pure JAX.

Implements every rotation parameterization the reference framework consumes via
``diffdrr.pose.convert`` (see call sites at /root/reference/src/xvr/model/sampler.py:29,
network.py:49, registrar/base.py:168): Euler angles with arbitrary intrinsic
conventions, axis-angle (= so(3) log map), unit quaternions (real-first),
continuous 6D rotations, 10D symmetric-matrix ("rotation_10d") and the
quaternion-adjugate representations used as the default training target
(/root/reference/src/xvr/config/trainer.py:17).

All functions are shape-polymorphic over leading batch dimensions and are
jit/vmap/grad-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

# Number of parameters each angular parameterization carries.
# Mirrors diffdrr.registration.N_ANGULAR_COMPONENTS (consumed at
# /root/reference/src/xvr/model/network.py:28).
N_ANGULAR_COMPONENTS = {
    "axis_angle": 3,
    "euler_angles": 3,
    "se3_log_map": 3,
    "quaternion": 4,
    "rotation_6d": 6,
    "rotation_10d": 10,
    "quaternion_adjugate": 10,
    "matrix": 9,
}


# ---------------------------------------------------------------------------
# Elementary rotations / Euler angles
# ---------------------------------------------------------------------------


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) about a named axis for angles in radians."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        rows = ((o, z, z), (z, c, -s), (z, s, c))
    elif axis == "Y":
        rows = ((c, z, s), (z, o, z), (-s, z, c))
    elif axis == "Z":
        rows = ((c, -s, z), (s, c, z), (z, z, o))
    else:
        raise ValueError(f"Unknown axis {axis!r}")
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def euler_to_matrix(angles: jnp.ndarray, convention: str, degrees: bool = False) -> jnp.ndarray:
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    ``convention`` is a 3-letter string of axes (e.g. "ZXY", the framework-wide
    default, /root/reference/src/xvr/config/trainer.py:18). Rotations are
    composed intrinsically in the order given:
    ``R = R_c0(a0) @ R_c1(a1) @ R_c2(a2)``.
    """
    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"Invalid Euler convention {convention!r}")
    if degrees:
        angles = jnp.deg2rad(angles)
    # precision="highest": on TPU the default matmul precision is bfloat16,
    # which puts ~4e-3 relative error into every pose matrix (0.2 deg of
    # rotation noise, mm-scale ray-endpoint noise) — catastrophic for
    # sub-degree registration. These are 3x3 products; full f32 is free.
    R = _axis_rotation(convention[0], angles[..., 0])
    R = jnp.matmul(R, _axis_rotation(convention[1], angles[..., 1]), precision="highest")
    R = jnp.matmul(R, _axis_rotation(convention[2], angles[..., 2]), precision="highest")
    return R


def _index(axis: str) -> int:
    return "XYZ".index(axis)


def _angle_from_tan(
    axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool
) -> jnp.ndarray:
    """Recover one outer Euler angle from a row/column of the rotation matrix.

    ``data`` is a (..., 3) slice: the relevant matrix column when extracting the
    first angle (``horizontal=False``) or row for the third (``horizontal=True``).
    """
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler(R: jnp.ndarray, convention: str, degrees: bool = False) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> intrinsic Euler angles (..., 3)."""
    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"Invalid Euler convention {convention!r}")
    i0, i2 = _index(convention[0]), _index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(R[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1.0, 1.0)
        )
    else:
        central = jnp.arccos(jnp.clip(R[..., i0, i0], -1.0, 1.0))

    a0 = _angle_from_tan(convention[0], convention[1], R[..., i2], False, tait_bryan)
    a2 = _angle_from_tan(convention[2], convention[1], R[..., i0, :], True, tait_bryan)
    angles = jnp.stack([a0, central, a2], axis=-1)
    if degrees:
        angles = jnp.rad2deg(angles)
    return angles


# ---------------------------------------------------------------------------
# Quaternions (real-first: w, x, y, z)
# ---------------------------------------------------------------------------


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternions (..., 4) (w, x, y, z) -> rotation matrices (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4), w >= 0.

    Uses the branch-free eigen decomposition trick: build all four candidate
    quaternion magnitudes and select the most numerically stable branch with
    ``jnp.where`` (gradient-safe; no data-dependent control flow).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Shepperd's method: for pivot p, q_pivot = sqrt(pivot_expr)/2 and the
    # other components are (matrix sums/differences) / (2 sqrt(pivot_expr)).
    pw = jnp.maximum(1 + tr, 1e-12)
    px = jnp.maximum(1 + m00 - m11 - m22, 1e-12)
    py = jnp.maximum(1 - m00 + m11 - m22, 1e-12)
    pz = jnp.maximum(1 - m00 - m11 + m22, 1e-12)
    q_w = jnp.stack([pw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * _safe_sqrt(pw)[..., None]
    )
    q_x = jnp.stack([m21 - m12, px, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * _safe_sqrt(px)[..., None]
    )
    q_y = jnp.stack([m02 - m20, m01 + m10, py, m12 + m21], axis=-1) / (
        2.0 * _safe_sqrt(py)[..., None]
    )
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, pz], axis=-1) / (
        2.0 * _safe_sqrt(pz)[..., None]
    )

    # Pick the branch whose pivot is largest.
    pivots = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    candidates = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(candidates, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    # Canonicalize sign (w >= 0)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Axis-angle (so(3) exp/log)
# ---------------------------------------------------------------------------


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> skew-symmetric (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def axis_angle_to_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula with a Taylor-safe small-angle branch.

    The untaken ``where`` branch must see safe operands or its (garbage)
    gradient poisons the result with NaNs — hence ``theta2_safe``.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * jnp.matmul(W, W, precision="highest")


def matrix_to_axis_angle(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map (..., 3, 3) -> (..., 3). Safe near theta = 0 and pi."""
    q = matrix_to_quaternion(R)
    return quaternion_to_axis_angle(q)


def quaternion_to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vnorm2 = jnp.sum(v * v, axis=-1)
    small = vnorm2 < 1e-18
    vnorm = jnp.sqrt(jnp.where(small, 1.0, vnorm2))
    theta = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(small, 2.0, theta / vnorm)
    return v * scale[..., None]


def axis_angle_to_quaternion(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = theta2 < 1e-12
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * jnp.where(small, 0.0, theta)
    sinc = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return jnp.concatenate([jnp.cos(half), sinc * w], axis=-1)


# ---------------------------------------------------------------------------
# 6D continuous representation (Zhou et al., CVPR 2019)
# ---------------------------------------------------------------------------


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(1e-12)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([R[..., 0, :], R[..., 1, :]], axis=-1)


# ---------------------------------------------------------------------------
# 10D symmetric-matrix representations
# ---------------------------------------------------------------------------
# rotation_10d: Peretroukhin et al. (RSS 2020) — a 10-vector parameterizes a
# symmetric 4x4 matrix A; the rotation is the eigenvector of A for the SMALLEST
# eigenvalue, interpreted as a quaternion.
# quaternion_adjugate: Hanson & Hanson (2022) — the 10 unique entries of the
# rank-one matrix q q^T; the quaternion is recovered from the largest-norm row.
# These give N_ANGULAR_COMPONENTS = 10 (training default "quaternion_adjugate",
# /root/reference/src/xvr/config/trainer.py:17).

_TRIU_I, _TRIU_J = jnp.triu_indices(4)


def vec10_to_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """10-vector (..., 10) -> symmetric matrix (..., 4, 4)."""
    shape = v.shape[:-1] + (4, 4)
    A = jnp.zeros(shape, dtype=v.dtype)
    A = A.at[..., _TRIU_I, _TRIU_J].set(v)
    AT = jnp.swapaxes(A, -1, -2)
    return A + AT - A * jnp.eye(4, dtype=v.dtype)


def symmetric_to_vec10(A: jnp.ndarray) -> jnp.ndarray:
    return A[..., _TRIU_I, _TRIU_J]


def rotation_10d_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    A = vec10_to_symmetric(v)
    _, eigvecs = jnp.linalg.eigh(A)
    q = eigvecs[..., :, 0]  # eigenvector for smallest eigenvalue
    return quaternion_to_matrix(q)


def matrix_to_rotation_10d(R: jnp.ndarray) -> jnp.ndarray:
    """Canonical (non-unique) 10D embedding: A = I - q q^T has q as its
    smallest-eigenvalue eigenvector."""
    q = matrix_to_quaternion(R)
    A = jnp.eye(4, dtype=R.dtype) - q[..., :, None] * q[..., None, :]
    return symmetric_to_vec10(A)


def quaternion_adjugate_to_quaternion(v: jnp.ndarray) -> jnp.ndarray:
    """10-vector of vech(q q^T) -> q, via the largest-norm row of q q^T.

    Branch-free: every row of q q^T equals q scaled by the corresponding
    component of q, so the row with the largest diagonal entry is the most
    numerically stable estimate of q (up to sign, which is irrelevant).
    """
    A = vec10_to_symmetric(v)
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    best = jnp.argmax(jnp.abs(diag), axis=-1)
    row = jnp.take_along_axis(A, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return row / jnp.linalg.norm(row, axis=-1, keepdims=True).clip(1e-12)


def quaternion_adjugate_to_matrix(v: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(quaternion_adjugate_to_quaternion(v))


def matrix_to_quaternion_adjugate(R: jnp.ndarray) -> jnp.ndarray:
    q = matrix_to_quaternion(R)
    return symmetric_to_vec10(q[..., :, None] * q[..., None, :])


# ---------------------------------------------------------------------------
# Projection onto SO(3)
# ---------------------------------------------------------------------------


def project_onto_so3(A: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD; det forced to +1.

    Semantics of /root/reference/src/xvr/utils/ants.py:71-82.
    """
    U, _, Vt = jnp.linalg.svd(A)
    det = jnp.linalg.det(jnp.matmul(U, Vt, precision="highest"))
    S = jnp.ones(A.shape[:-2] + (3,), dtype=A.dtype)
    S = S.at[..., -1].set(det)
    return jnp.matmul(U * S[..., None, :], Vt, precision="highest")

"""SE(3) rigid transforms as a JAX pytree.

Replaces the ``diffdrr.pose`` module the reference depends on (API contract
derived from call sites: /root/reference/src/xvr/model/sampler.py:29-31,
trainer.py:204-210, network.py:49-54, registrar/base.py:168,
utils/ants.py:71-82).

Conventions (fixed framework-wide, documented once here):

* A :class:`RigidTransform` wraps a (..., 4, 4) homogeneous matrix ``M`` acting
  on **column** vectors: ``x_world = R @ x + t``.
* ``a.compose(b)`` means "apply ``a``, then ``b``": ``(a.compose(b)).matrix ==
  b.matrix @ a.matrix``. This makes ``pose.compose(offset)`` (trainer.py:190)
  translate a pose sampled about the origin to the volume's world isocenter,
  and ``pred_pose.compose(reframe)`` (trainer.py:210) map a template-frame
  prediction into the patient frame.
* ``a @ b`` is the raw matrix product ``a.matrix @ b.matrix`` (used by the
  multiview-consistency loss, /root/reference/src/xvr/model/loss.py:47-50).
* Euler convention default is intrinsic "ZXY", angles in degrees only where a
  call site says so (sampler.py:31 passes degrees=True).
* ``convert(rot, xyz)`` interprets ``xyz`` in the **camera (body) frame**:
  the matrix is ``[R | R @ xyz]`` (rotate-then-translate), so a pose with
  ``xyz = (0, ty, 0)`` orbits the world origin at radius ``ty`` for ANY
  rotation — the C-arm geometry the reference's pose parameters demand.
  Evidence from the reference: training sweeps of --r1 spanning 150-195
  degrees with ty in a narrow positive band must keep the volume in view at
  every sampled angle (/root/reference/scripts/ljubljana/train/de_novo.sh
  r1 in [-45, 105] covering both frontal and lateral X-rays;
  scripts/femur/train/de_novo.sh r1 in [75, 270]), and the DICOM-header pose
  (rot=(positioner angles), xyz=(0, source-to-patient, 0),
  /root/reference/src/xvr/io/xray.py:77-90) must place the source at
  source-to-patient distance from the isocenter for ANY positioner angle.
  Both hold only if the translation rotates with R. ``RigidTransform.convert``
  inverts this (returns the camera-frame ``R^T t``), so param round-trips are
  exact. ``make_matrix``/``make_translation`` remain literal ``[R | t]``.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import so3
from .so3 import N_ANGULAR_COMPONENTS  # re-export  # noqa: F401


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class RigidTransform:
    """Batched SE(3) transform backed by a (..., 4, 4) matrix."""

    matrix: jnp.ndarray

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.matrix,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    # -- constructors -------------------------------------------------------
    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "RigidTransform":
        eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))
        return cls(eye)

    # -- algebra ------------------------------------------------------------
    @property
    def R(self) -> jnp.ndarray:
        return self.matrix[..., :3, :3]

    @property
    def t(self) -> jnp.ndarray:
        return self.matrix[..., :3, 3]

    def compose(self, other: "RigidTransform") -> "RigidTransform":
        """Apply ``self`` first, then ``other``."""
        # precision="highest" on all pose products: TPU default matmul
        # precision is bfloat16 (~4e-3 relative), far too coarse for
        # sub-degree/mm pose algebra; 4x4 products at f32 are free.
        return RigidTransform(jnp.matmul(other.matrix, self.matrix, precision="highest"))

    def __matmul__(self, other: "RigidTransform") -> "RigidTransform":
        return RigidTransform(jnp.matmul(self.matrix, other.matrix, precision="highest"))

    def inverse(self) -> "RigidTransform":
        Rt = jnp.swapaxes(self.R, -1, -2)
        t = -jnp.matmul(Rt, self.t[..., None], precision="highest")[..., 0]
        return RigidTransform(make_matrix(Rt, t))

    def __call__(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply to points (..., N, 3) -> (..., N, 3)."""
        return (
            jnp.matmul(pts, jnp.swapaxes(self.R, -1, -2), precision="highest")
            + self.t[..., None, :]
        )

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return self(pts)

    # -- batching sugar ------------------------------------------------------
    def __getitem__(self, idx) -> "RigidTransform":
        return RigidTransform(self.matrix[idx])

    def __len__(self) -> int:
        if self.matrix.ndim < 3:
            raise TypeError("len() of an unbatched RigidTransform")
        return self.matrix.shape[0]

    @property
    def batch_shape(self):
        return self.matrix.shape[:-2]

    # -- conversions ---------------------------------------------------------
    def convert(self, parameterization: str, convention: str | None = None, degrees: bool = False):
        """Matrix -> (rot, xyz) parameters. Inverse of :func:`convert`.

        ``xyz`` is returned in the camera frame (``R^T t``) to invert the
        rotate-then-translate composition of :func:`convert` (see module
        docstring)."""
        R = self.R
        t = jnp.matmul(jnp.swapaxes(R, -1, -2), self.t[..., None], precision="highest")[..., 0]
        if parameterization == "euler_angles":
            if convention is None:
                raise ValueError("euler_angles requires a convention")
            return so3.matrix_to_euler(R, convention, degrees=degrees), t
        if parameterization == "axis_angle":
            return so3.matrix_to_axis_angle(R), t
        if parameterization == "quaternion":
            return so3.matrix_to_quaternion(R), t
        if parameterization == "rotation_6d":
            return so3.matrix_to_rotation_6d(R), t
        if parameterization == "rotation_10d":
            return so3.matrix_to_rotation_10d(R), t
        if parameterization == "quaternion_adjugate":
            return so3.matrix_to_quaternion_adjugate(R), t
        if parameterization == "matrix":
            return R, t
        if parameterization == "se3_log_map":
            return se3_log_map(self)
        raise ValueError(f"Unknown parameterization {parameterization!r}")


def make_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3).

    Semantics of ``diffdrr.pose.make_matrix`` (used at
    /root/reference/src/xvr/utils/ants.py:82).
    """
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def convert(
    rot: jnp.ndarray,
    xyz: jnp.ndarray | None = None,
    parameterization: str = "euler_angles",
    convention: str | None = None,
    degrees: bool = False,
) -> RigidTransform:
    """(rot, xyz) parameters -> :class:`RigidTransform`.

    Mirrors ``diffdrr.pose.convert`` call sites (sampler.py:29-31,
    network.py:49-54, io/xray.py:83-89).
    """
    rot = jnp.asarray(rot)
    if parameterization == "se3_log_map":
        if xyz is None:
            raise ValueError("se3_log_map requires both rot (omega) and xyz (upsilon)")
        return se3_exp_map(rot, jnp.asarray(xyz))
    if parameterization == "euler_angles":
        if convention is None:
            raise ValueError("euler_angles requires a convention")
        R = so3.euler_to_matrix(rot, convention, degrees=degrees)
    elif parameterization == "axis_angle":
        R = so3.axis_angle_to_matrix(rot)
    elif parameterization == "quaternion":
        R = so3.quaternion_to_matrix(rot)
    elif parameterization == "rotation_6d":
        R = so3.rotation_6d_to_matrix(rot)
    elif parameterization == "rotation_10d":
        R = so3.rotation_10d_to_matrix(rot)
    elif parameterization == "quaternion_adjugate":
        R = so3.quaternion_adjugate_to_matrix(rot)
    elif parameterization == "matrix":
        R = rot
    else:
        raise ValueError(f"Unknown parameterization {parameterization!r}")
    if xyz is None:
        xyz = jnp.zeros(rot.shape[:-1] + (3,), dtype=rot.dtype)
    # camera-frame translation: M = [R | R @ xyz] (see module docstring)
    t = jnp.matmul(R, jnp.asarray(xyz)[..., None], precision="highest")[..., 0]
    return RigidTransform(make_matrix(R, t))


def make_translation(xyz: jnp.ndarray) -> RigidTransform:
    """Pure translation (semantics of trainer.py:335-337)."""
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.asarray(xyz).dtype), jnp.asarray(xyz).shape[:-1] + (3, 3))
    return RigidTransform(make_matrix(R, jnp.asarray(xyz)))


# ---------------------------------------------------------------------------
# se(3) exp/log maps
# ---------------------------------------------------------------------------


def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """V such that exp([w, v]) has translation V @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    W = so3.hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * jnp.matmul(W, W, precision="highest")


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = 0.5 * theta
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / theta2_safe,
    )
    W = so3.hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * jnp.matmul(W, W, precision="highest")


def se3_exp_map(omega: jnp.ndarray, upsilon: jnp.ndarray) -> RigidTransform:
    R = so3.axis_angle_to_matrix(omega)
    V = _so3_left_jacobian(omega)
    t = jnp.matmul(V, upsilon[..., None], precision="highest")[..., 0]
    return RigidTransform(make_matrix(R, t))


def se3_log_map(T: RigidTransform):
    omega = so3.matrix_to_axis_angle(T.R)
    Vinv = _so3_left_jacobian_inv(omega)
    upsilon = jnp.matmul(Vinv, T.t[..., None], precision="highest")[..., 0]
    return omega, upsilon


def project_onto_SO3(T: RigidTransform) -> RigidTransform:
    """Project the linear part of an affine 4x4 onto SO(3), preserving the
    mapped origin (semantics of /root/reference/src/xvr/utils/ants.py:71-82:
    ``t' = R @ (A^-1 @ t)`` so the origin's image is preserved)."""
    A, t = T.matrix[..., :3, :3], T.matrix[..., :3, 3]
    R = so3.project_onto_so3(A)
    t_local = jnp.linalg.solve(A, t[..., None])
    t = jnp.matmul(R, t_local, precision="highest")[..., 0]
    return RigidTransform(make_matrix(R, t))

"""CT/MR volume representation and HU -> attenuation transfer.

Replaces the ``diffdrr.data`` boundary (``read``, ``transform_hu_to_density``;
call sites /root/reference/src/xvr/model/utils.py:40, trainer.py:196-197,
renderer/load.py:26).

A :class:`Volume` is a JAX pytree holding the raw intensity grid (indexed
``data[i, j, k]``), an affine mapping voxel indices to world millimetres, and
an optional integer labelmap. Voxel *centers* sit at integer indices; the
volume occupies ``[-0.5, n-0.5]`` along each axis in index space.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import RigidTransform, make_matrix


@partial(jax.tree_util.register_dataclass, data_fields=["data", "affine", "mask"], meta_fields=["orientation"])
@dataclass(frozen=True)
class Volume:
    """Intensity volume + voxel->world affine (+ optional labelmap)."""

    data: jnp.ndarray  # (nx, ny, nz) raw intensities (HU for CT)
    affine: jnp.ndarray  # (4, 4) voxel index -> world mm
    mask: jnp.ndarray | None = None  # (nx, ny, nz) integer labels
    orientation: str | None = "AP"  # anatomical orientation tag ("AP"/"PA"/None)

    @property
    def shape(self):
        return self.data.shape

    @property
    def affine_inverse(self) -> jnp.ndarray:
        return jnp.linalg.inv(self.affine)

    @property
    def spacing(self) -> jnp.ndarray:
        """Per-axis voxel spacing in mm."""
        return jnp.linalg.norm(self.affine[:3, :3], axis=0)

    @property
    def center(self) -> jnp.ndarray:
        """World coordinates of the volume center, shape (3,).

        Matches ``subject.volume.get_center()`` semantics
        (/root/reference/src/xvr/model/utils.py:168): the world image of the
        central voxel index ``(n - 1) / 2``.
        """
        idx = (jnp.asarray(self.data.shape, dtype=self.affine.dtype) - 1.0) / 2.0
        return jnp.matmul(self.affine[:3, :3], idx, precision="highest") + self.affine[:3, 3]

    def center_translation(self) -> RigidTransform:
        """Pure translation to the volume isocenter (trainer.py:258-262)."""
        eye = jnp.eye(3, dtype=self.affine.dtype)
        return RigidTransform(make_matrix(eye, self.center))

    def world_to_voxel(self, pts: jnp.ndarray) -> jnp.ndarray:
        """World mm (..., 3) -> continuous voxel indices (..., 3)."""
        Ainv = self.affine_inverse
        return jnp.matmul(pts, Ainv[:3, :3].T, precision="highest") + Ainv[:3, 3]


def transform_hu_to_density(volume: jnp.ndarray, bone_attenuation_multiplier: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Piecewise HU -> relative attenuation transfer, rescaled to [0, 1].

    Semantics of ``diffdrr.data.transform_hu_to_density`` as consumed at
    /root/reference/src/xvr/model/trainer.py:196-197 (the bone multiplier is
    resampled from U(1, 10) every training step): air (<= -800 HU) maps to the
    soft-tissue floor, soft tissue (-800, 350] passes through, bone (> 350) is
    scaled by the multiplier; the result is min-max normalized.
    """
    v = volume.astype(jnp.float32)
    air = v <= -800.0
    bone = v > 350.0
    # Floor used for air: the minimum over the non-air voxels (approximated by
    # clipping; exact min over a masked set, computed branch-free).
    big = jnp.asarray(jnp.finfo(jnp.float32).max)
    soft_min = jnp.min(jnp.where(air, big, v))
    soft_min = jnp.where(jnp.isfinite(soft_min) & (soft_min < big), soft_min, -800.0)
    density = jnp.where(air, soft_min, v)
    density = jnp.where(bone, v * bone_attenuation_multiplier, density)
    density = density - jnp.min(density)
    density = density / jnp.clip(jnp.max(density), 1e-12)
    return density


def load_example_ct(orientation: str | None = "AP", n: int = 96, spacing: float = 2.0) -> Volume:
    """A synthetic example CT (API parity with ``diffdrr.data.load_example_ct``,
    used by the reference when initializing a DRR without a subject,
    /root/reference/src/xvr/model/utils.py:154-156). Air background with a
    soft-tissue ellipsoid, a bone shell, and asymmetric bone markers — no
    download required."""
    c = (n - 1) / 2.0
    idx = np.arange(n)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    rx, ry, rz = n / 2.6, n / 3.2, n / 2.4
    r2 = ((X - c) / rx) ** 2 + ((Y - c) / ry) ** 2 + ((Z - c) / rz) ** 2
    hu = np.where(r2 <= 1.0, 40.0, -1000.0).astype(np.float32)
    shell = (r2 <= 0.55) & (r2 >= 0.35)
    hu += np.where(shell, 900.0, 0.0)
    hu[int(c) + n // 6 : int(c) + n // 4, int(c) - 2 : int(c) + 2, int(c) - 2 : int(c) + 2] = 1400.0
    affine = np.eye(4, dtype=np.float32) * spacing
    affine[3, 3] = 1.0
    affine[:3, 3] = -c * spacing
    return Volume(
        data=jnp.asarray(hu), affine=jnp.asarray(affine), orientation=orientation
    )


def make_test_volume(n: int = 32, spacing: float = 1.0, kind: str = "cube") -> Volume:
    """Synthetic phantoms for tests and benchmarks (no data files needed)."""
    c = (n - 1) / 2.0
    idx = np.arange(n)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    if kind == "cube":
        half = n // 4
        data = (
            (np.abs(X - c) <= half) & (np.abs(Y - c) <= half) & (np.abs(Z - c) <= half)
        ).astype(np.float32)
    elif kind == "sphere":
        r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
        data = (r2 <= (n / 4) ** 2).astype(np.float32)
    elif kind == "gradient":
        data = (X + 2 * Y + 3 * Z).astype(np.float32) / (6.0 * n)
    elif kind == "random":
        rng = np.random.default_rng(0)
        data = rng.uniform(size=(n, n, n)).astype(np.float32)
    else:
        raise ValueError(kind)
    affine = np.eye(4, dtype=np.float32) * spacing
    affine[3, 3] = 1.0
    # center the volume at the world origin
    affine[:3, 3] = -c * spacing
    return Volume(data=jnp.asarray(data), affine=jnp.asarray(affine))

"""C-arm detector geometry: intrinsics -> per-pixel rays, projections.

Replaces ``diffdrr.drr.DRR``'s detector component (API contract from call sites
at /root/reference/src/xvr/model/trainer.py:283, registrar/base.py:147-157,
metrics/evaluator.py:19-25).

Camera-frame convention (fixed here, documented once):

* The X-ray **source** sits at the camera origin ``(0, 0, 0)``.
* The **detector plane** is centered at ``(0, -sdd, 0)``: the beam travels
  along **-y**. With an identity pose and the DICOM-header pose construction
  (rot = (positioner angles, 0), xyz = (0, +source-to-patient, 0); see
  /root/reference/src/xvr/io/xray.py:77-90) this puts the source anterior of an
  AP patient and the detector posterior.
* Image **rows** (height axis, spacing ``delx``, principal offset ``y0``) run
  top-to-bottom along **-z** (superior at the top of the image).
* Image **columns** (width axis, spacing ``dely``, principal offset ``x0``) run
  left-to-right along **+x**, negated when ``reverse_x_axis`` is set
  (radiographic convention flag, /root/reference/src/xvr/config/trainer.py:11).
* A pose maps camera coordinates to world (= volume, mm) coordinates.

The detector is a *static* (hashable) dataclass: intrinsics changes recompile,
which happens once per DICOM / pyramid scale (matching the reference's
``set_intrinsics_`` / ``rescale_detector_`` cadence, registrar/base.py:155,212).
"""

from __future__ import annotations

from dataclasses import dataclass, replace as _replace

import jax.numpy as jnp

from .se3 import RigidTransform


@dataclass(frozen=True)
class Detector:
    sdd: float
    height: int
    width: int
    delx: float
    dely: float
    x0: float = 0.0
    y0: float = 0.0
    reverse_x_axis: bool = False

    # -- construction helpers ------------------------------------------------
    def replace(self, **kwargs) -> "Detector":
        return _replace(self, **kwargs)

    def rescale(self, factor: float) -> "Detector":
        """Coarsen the detector by ``factor`` (> 1 = fewer, larger pixels).

        Semantics of ``DRR.rescale_detector_`` as used by the multiscale
        pyramid (/root/reference/src/xvr/registrar/base.py:212).
        """
        height = max(int(round(self.height / factor)), 1)
        width = max(int(round(self.width / factor)), 1)
        return self.replace(
            height=height,
            width=width,
            delx=self.delx * self.height / height,
            dely=self.dely * self.width / width,
        )

    # -- geometry ------------------------------------------------------------
    @property
    def n_rays(self) -> int:
        return self.height * self.width

    def _target_grid(self, dtype=jnp.float32) -> jnp.ndarray:
        """Detector pixel centers in the camera frame, (H*W, 3) row-major."""
        i = jnp.arange(self.height, dtype=dtype)
        j = jnp.arange(self.width, dtype=dtype)
        v = (i - (self.height - 1) / 2.0) * self.delx + self.y0  # rows, -z
        u = (j - (self.width - 1) / 2.0) * self.dely + self.x0  # cols, +x
        sx = -1.0 if self.reverse_x_axis else 1.0
        x = jnp.broadcast_to(sx * u[None, :], (self.height, self.width))
        z = jnp.broadcast_to(-v[:, None], (self.height, self.width))
        y = jnp.full((self.height, self.width), -self.sdd, dtype=dtype)
        return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)

    def rays_numpy(self, pose_matrix):
        """Host-side (NumPy, float64) twin of :meth:`rays` for window/steepness
        measurements: probe endpoints never touch the device, so per-stage
        kernel sizing costs no device transfers (tens of MB per stage through
        a remote-TPU tunnel otherwise).

        ``pose_matrix``: (B, 4, 4) NumPy array of ALREADY-ORIENTED poses.
        Returns (source (B, 1, 3), target (B, H*W, 3)).
        """
        import numpy as np

        M = np.asarray(pose_matrix, dtype=np.float64).reshape(-1, 4, 4)
        i = np.arange(self.height, dtype=np.float64)
        j = np.arange(self.width, dtype=np.float64)
        v = (i - (self.height - 1) / 2.0) * self.delx + self.y0
        u = (j - (self.width - 1) / 2.0) * self.dely + self.x0
        sx = -1.0 if self.reverse_x_axis else 1.0
        x = np.broadcast_to(sx * u[None, :], (self.height, self.width))
        z = np.broadcast_to(-v[:, None], (self.height, self.width))
        y = np.full((self.height, self.width), -self.sdd)
        tgt_cam = np.stack([x, y, z], axis=-1).reshape(-1, 3)
        R, t = M[:, :3, :3], M[:, :3, 3]
        source = t[:, None, :]
        target = np.einsum("bij,nj->bni", R, tgt_cam) + t[:, None, :]
        # f32 outputs: the window-measurement consumers run 10-30x slower on
        # f64 strided slices, and f32 is plenty for integer window spans
        return source.astype(np.float32), target.astype(np.float32)

    def rays(self, pose: RigidTransform, calibration: RigidTransform | None = None):
        """World-frame ray endpoints for a batch of poses.

        Returns ``(source, target)`` with shapes (..., 1, 3) and (..., H*W, 3)
        — the contract of ``drr.detector(pose, calibration)`` at
        /root/reference/src/xvr/model/trainer.py:283.
        """
        target_cam = self._target_grid()
        source_cam = jnp.zeros((1, 3), dtype=target_cam.dtype)
        if calibration is not None:
            source_cam = calibration(source_cam[None])[0]
            target_cam = calibration(target_cam[None])[0]
        batch = pose.batch_shape
        source = pose(jnp.broadcast_to(source_cam, batch + (1, 3)))
        target = pose(jnp.broadcast_to(target_cam, batch + (self.n_rays, 3)))
        return source, target

    def perspective_projection(self, pose: RigidTransform, pts: jnp.ndarray) -> jnp.ndarray:
        """Project world points (..., N, 3) onto the detector -> pixel (col, row).

        Contract of ``DRR.perspective_projection`` (evaluator.py:19-22).
        """
        cam = pose.inverse()(pts)
        lam = -self.sdd / cam[..., 1]
        proj = cam * lam[..., None]
        sx = -1.0 if self.reverse_x_axis else 1.0
        u = proj[..., 0] * sx
        v = -proj[..., 2]
        col = (u - self.x0) / self.dely + (self.width - 1) / 2.0
        row = (v - self.y0) / self.delx + (self.height - 1) / 2.0
        return jnp.stack([col, row], axis=-1)

    def inverse_projection(self, pose: RigidTransform, pts2d: jnp.ndarray) -> jnp.ndarray:
        """Pixel (col, row) (..., N, 2) -> world position on the detector plane.

        Contract of ``DRR.inverse_projection`` (evaluator.py:24-26); the mRPE
        metric measures 3D distances between these backprojections.
        """
        col, row = pts2d[..., 0], pts2d[..., 1]
        u = (col - (self.width - 1) / 2.0) * self.dely + self.x0
        v = (row - (self.height - 1) / 2.0) * self.delx + self.y0
        sx = -1.0 if self.reverse_x_axis else 1.0
        x = sx * u
        z = -v
        y = jnp.full_like(x, -self.sdd)
        cam = jnp.stack([x, y, z], axis=-1)
        return pose(cam)

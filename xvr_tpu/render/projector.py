"""The Projector: volume + detector -> differentiable DRR rendering.

TPU-native replacement for ``diffdrr.drr.DRR`` (full API contract from call
sites: /root/reference/src/xvr/renderer/load.py:29-41, model/utils.py:154-171,
model/trainer.py:279-304, registrar/base.py:155-157,212,
metrics/evaluator.py:19-25).

Design: a frozen pytree dataclass. The volume (density, affine, labelmap) is
traced data; the detector and renderer choice are static metadata, so changing
intrinsics or pyramid scale produces a new compiled executable (one per scale,
known up front — matching the reference's precompile-once-per-stage cadence).
"""

from __future__ import annotations

from dataclasses import dataclass, replace as _replace
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.detector import Detector
from ..geometry.se3 import RigidTransform
from . import xla
from .volume import Volume, transform_hu_to_density


def _batched(pose: RigidTransform) -> RigidTransform:
    if pose.matrix.ndim == 2:
        return RigidTransform(pose.matrix[None])
    return pose


def orientation_transform(orientation: str | None, dtype=jnp.float32) -> RigidTransform:
    """Camera-frame pre-rotation for anatomical orientation.

    With the camera-frame-translation pose convention (see
    xvr_tpu/geometry/se3.py: ``convert`` builds ``[R | R @ xyz]``), any pose
    with ``xyz = (0, ty, 0)``, ``ty > 0`` orbits the world origin, so the
    reference's training ranges (alpha sweeps of 150-195 degrees,
    /root/reference/scripts/femur/train/de_novo.sh r1 in [75, 270]) and the
    DICOM positioner pose (io/xray.py:77-90) view the volume at EVERY angle.
    The orientation transform only fixes the image's handedness/up-direction:

    * "AP" (and None): identity. alpha ~ 180 (the DeepFluoro training
      convention) looks from posterior (-y, the under-table X-ray source)
      toward anterior; the DICOM AP pose (alpha ~ 0) looks from anterior.
      Rows map superior to the top of the image.
    * "PA": rotate 180 deg about x — flips which detector edge is superior,
      and composes with the DICOM PA pose's negated source-to-patient
      translation (io/xray.py:79-81) so the beam still crosses the origin.
    """
    if orientation == "PA":
        M = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], dtype=dtype))
        return RigidTransform(M)
    if orientation in (None, "AP"):
        return RigidTransform(jnp.eye(4, dtype=dtype))
    raise ValueError(f"Unrecognized orientation {orientation!r}")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["volume", "density"],
    meta_fields=[
        "detector", "renderer", "labels", "n_samples", "voxel_shift",
        "pallas_perm", "pallas_window", "pallas_remap",
        "shearwarp_window", "shearwarp_grid", "shearwarp_bounds",
        "shearwarp_remap",
    ],
)
@dataclass(frozen=True)
class Projector:
    volume: Volume
    density: jnp.ndarray  # precomputed attenuation grid (overridable per call)
    detector: Detector
    renderer: str = "trilinear"  # "trilinear" | "siddon" (+ "_pallas" variants)
    labels: tuple[int, ...] | None = None  # labelmap channels to render
    n_samples: int = 256  # trilinear samples per ray
    voxel_shift: float = 0.0
    # Pallas fast-path metadata (static): the volume-axis permutation for the
    # slab-marching kernel and its transverse window size. Set via
    # with_pallas(); None means probe at call time (host-side, not jittable).
    pallas_perm: tuple[int, int, int] | None = None
    pallas_window: int = 32
    # group rays by their window coordinate instead of detector adjacency
    # (in-graph argsort + unsort); shrinks the window ~3x under roll/skew on
    # large detectors. Chosen automatically by tuned_for()/with_pallas().
    pallas_remap: bool = False
    # shear-warp (MXU) renderer metadata: the final warp's per-tile slope-row
    # window and the slope-grid resolution (None = detector-derived default).
    # Set via with_shearwarp().
    shearwarp_window: int = 48
    shearwarp_grid: tuple[int, int] | None = None
    # static per-channel march-slab bounds for labelmap channel renders
    # (channel_slab_bounds); None = every channel marches all slabs.
    shearwarp_bounds: tuple[tuple[int, int], ...] | None = None
    # barrel-shear the final warp per detector column (flattens the gather
    # window under in-plane roll, like the slab kernel's pallas_remap)
    shearwarp_remap: bool = False

    # -- construction --------------------------------------------------------
    @classmethod
    def from_volume(
        cls,
        volume: Volume,
        sdd: float,
        height: int,
        delx: float,
        width: int | None = None,
        dely: float | None = None,
        x0: float = 0.0,
        y0: float = 0.0,
        reverse_x_axis: bool = False,
        renderer: str = "trilinear",
        labels=None,
        n_samples: int | None = None,
        voxel_shift: float = 0.0,
        bone_attenuation_multiplier: float = 1.0,
    ) -> "Projector":
        """Build a projector the way ``initialize_drr`` builds a DRR
        (/root/reference/src/xvr/renderer/load.py:29-41)."""
        det = Detector(
            sdd=float(sdd),
            height=int(height),
            width=int(width if width is not None else height),
            delx=float(delx),
            dely=float(dely if dely is not None else delx),
            x0=float(x0),
            y0=float(y0),
            reverse_x_axis=bool(reverse_x_axis),
        )
        if n_samples is None:
            # Enough steps to resolve the volume diagonal at ~1 sample/voxel,
            # rounded up to a multiple of 8 for TPU-friendly shapes.
            diag = float(jnp.linalg.norm(jnp.asarray(volume.shape, jnp.float32)))
            n_samples = int(-(-int(diag) // 8) * 8)
        if labels is not None:
            labels = tuple(int(x) for x in labels)
        density = transform_hu_to_density(volume.data, bone_attenuation_multiplier)
        return cls(
            volume=volume,
            density=density,
            detector=det,
            renderer=renderer,
            labels=labels,
            n_samples=int(n_samples),
            voxel_shift=float(voxel_shift),
        )

    def replace(self, **kwargs) -> "Projector":
        return _replace(self, **kwargs)

    # -- intrinsics management ----------------------------------------------
    def set_intrinsics(self, **kwargs) -> "Projector":
        """Functional ``set_intrinsics_`` (registrar/base.py:155)."""
        det = self.detector.replace(
            **{k: v for k, v in kwargs.items() if v is not None}
        )
        return self.replace(detector=det)

    def rescale_detector(self, scale: float) -> "Projector":
        """Functional ``rescale_detector_`` (registrar/base.py:212)."""
        return self.replace(detector=self.detector.rescale(scale))

    def with_pallas(
        self,
        reference_pose=None,
        window: int | None = None,
        probe_poses=None,
    ) -> "Projector":
        """Switch the trilinear renderer to the Pallas TPU fast path, fixing
        the kernel's volume-axis permutation from a representative pose so the
        render stays jit-traceable.

        When ``window`` is None, the kernel's static transverse window is
        sized EXACTLY from the probe poses (``probe_poses`` if given, else the
        reference pose) via :func:`~xvr_tpu.render.pallas.measured_window_span`
        — an undersized window silently clips ray contributions, so callers
        that render at poses away from the probes must include representative
        extremes in ``probe_poses``. If the probe rays deviate more than ~45
        degrees from the march axis the kernel model breaks; this returns
        ``self`` unchanged (XLA path) in that case.
        """
        from .pallas import (
            choose_permutation_for_pose,
            measured_steepness,
            packed_table_bytes,
        )

        import numpy as np

        if reference_pose is not None:
            # the kernel sees rays from the ORIENTED pose (reorient composed)
            oriented = self._oriented(reference_pose)
            R = np.asarray(jax.device_get(oriented.R)).reshape(-1, 3, 3).mean(axis=0)
        else:
            R = np.asarray(
                jax.device_get(orientation_transform(self.volume.orientation).R)
            )
        perm = choose_permutation_for_pose(R, np.asarray(jax.device_get(self.affine_inverse)))
        table_mb = packed_table_bytes(self.density, perm) >> 20
        if table_mb > 100:
            # beyond VMEM the render wrappers auto-select the HBM-streaming
            # kernel (slab chunks as the outermost grid dim)
            print(
                f"with_pallas: packed volume is {table_mb} MB; "
                "using the HBM-streaming kernel",
                flush=True,
            )
        proj = self.replace(
            renderer="trilinear_pallas",
            pallas_perm=perm,
            pallas_window=int(window) if window is not None else self.pallas_window,
        )
        probes = probe_poses if probe_poses is not None else reference_pose
        if probes is not None:
            src, tgt = proj.rays_host(probes)
            args = (src, tgt, proj.affine_inverse_host(), perm)
            if measured_steepness(*args) > 1.2:
                print(
                    "with_pallas: rays exceed 45deg of the march axis; "
                    "keeping the XLA renderer",
                    flush=True,
                )
                return self
            if window is None:
                proj = proj.tuned_for(probes)
        return proj

    def with_shearwarp(
        self,
        reference_pose=None,
        probe_poses=None,
        differentiable: bool = True,
        grid_shape: tuple[int, int] | None = None,
        quantum: int = 8,
        flavor: str | None = None,
    ) -> "Projector":
        """Switch the renderer to the shear-warp MXU fast path.

        ``differentiable=True`` selects ``{flavor}_fast`` (shear-warp forward
        + the analytic shear-warp adjoint backward, ~3x forward cost — the
        pairing validated in tests/test_shearwarp.py); False selects the
        forward-only ``{flavor}_shearwarp``. ``flavor`` defaults to the
        current renderer family: "trilinear" (tent profile) or "siddon"
        (narrow trapezoid — the piecewise-constant Siddon model up to a
        quarter-voxel transverse smoothing). Like :meth:`with_pallas`, the
        volume-axis permutation and the static gather windows are fixed
        host-side from a representative pose; probe poses should bracket the
        poses that will be rendered (an undersized warp window silently
        clips). Falls back to ``self`` unchanged (XLA path) when probe rays
        exceed ~70 degrees of the march axis — unlike the slab kernel (hard
        45-degree invariants), the shear-warp factorization has no
        correctness cliff: steeper rays only widen the per-image slope grid,
        trading transverse resolution (mild blur at the steepest poses).
        Labelmap channel rendering runs natively (per-channel masked volumes
        folded into the MXU accumulate).
        """
        from .pallas import choose_permutation_for_pose, measured_steepness
        from .shearwarp import measured_warp_window

        import numpy as np

        if flavor is None:
            flavor = "siddon" if self.renderer.startswith("siddon") else "trilinear"
        if flavor not in ("trilinear", "siddon"):
            raise ValueError(f"unknown shear-warp flavor {flavor!r}")
        if reference_pose is not None:
            oriented = self._oriented(_batched(reference_pose))
            R = np.asarray(jax.device_get(oriented.R)).reshape(-1, 3, 3).mean(axis=0)
        else:
            R = np.asarray(
                jax.device_get(orientation_transform(self.volume.orientation).R)
            )
        perm = choose_permutation_for_pose(
            R, np.asarray(jax.device_get(self.affine_inverse))
        )
        chan_bounds = None
        if self.labels is not None and self.volume.mask is not None:
            from .shearwarp import channel_slab_bounds

            # static per-label march bounds: compact labels skip the slabs
            # outside their bounding box (exact — those contribute zero)
            chan_bounds = channel_slab_bounds(self.volume.mask, self.labels, perm)
        proj = self.replace(
            renderer=f"{flavor}_fast" if differentiable else f"{flavor}_shearwarp",
            pallas_perm=perm,
            pallas_remap=False,
            shearwarp_grid=tuple(int(x) for x in grid_shape) if grid_shape else None,
            shearwarp_bounds=chan_bounds,
        )
        probes = probe_poses if probe_poses is not None else reference_pose
        if probes is not None:
            src, tgt = proj.rays_host(probes)
            args = (src, tgt, proj.affine_inverse_host(), perm)
            if measured_steepness(*args) > 2.8:
                print(
                    "with_shearwarp: rays exceed ~70deg of the march axis; "
                    "keeping the XLA renderer",
                    flush=True,
                )
                return self
            ds = (self.detector.height, self.detector.width)
            w_det = measured_warp_window(*args, ds, proj.shearwarp_grid)
            q = lambda w: int(-(-w // quantum) * quantum)
            # measure the sheared layout only when it could possibly win
            # (the switchover below needs a >= 96-row saving)
            w_remap = (
                measured_warp_window(*args, ds, proj.shearwarp_grid, remap=True)
                if q(w_det) >= 96
                else w_det
            )
            # the sheared layout pays 4 barrel shears (~12 ms / 192-batch at
            # 256^2) plus ~pad/Hd more tiles; each saved window row is worth
            # ~0.13 ms, so remap only wins for extreme rolls (measured on
            # v5e: plain w=72 @ 5,505 DRRs/s vs remap w=32 @ 3,918 — keep the
            # plain layout unless the saving is very large)
            use_remap = q(w_det) >= q(w_remap) + 96
            proj = proj.replace(
                shearwarp_window=q(w_remap) if use_remap else q(w_det),
                shearwarp_remap=use_remap,
            )
        return proj

    def tuned_for(self, poses, quantum: int = 8) -> "Projector":
        """Re-measure the Pallas window for these poses and pick the cheaper
        ray layout: detector tiles, or the sorted remap when it shrinks the
        window by more than the sort/unsort overhead is worth (one quantum).
        Small detectors (<~1 tile of 1024 rays) never benefit from the remap;
        large detectors under in-plane roll shrink ~3x."""
        w_det = self.replace(pallas_remap=False).measure_window(poses, quantum)
        w_remap = self.replace(pallas_remap=True).measure_window(poses, quantum)
        if w_remap + quantum < w_det:
            return self.replace(pallas_window=w_remap, pallas_remap=True)
        return self.replace(pallas_window=w_det, pallas_remap=False)

    def measure_window(self, poses, quantum: int = 8) -> int:
        """Exact Pallas window for ``poses`` (see measured_window_span),
        rounded up to a multiple of ``quantum`` (coarser quanta improve
        compile-cache reuse when windows are re-measured per stage)."""
        from .pallas import measured_window_span

        import numpy as np

        if self.pallas_perm is None:
            raise ValueError("measure_window requires pallas_perm (use with_pallas)")
        src, tgt = self.rays_host(poses)
        vol_shape = tuple(int(self.density.shape[a]) for a in self.pallas_perm)
        span = measured_window_span(
            src, tgt, self.affine_inverse_host(),
            self.pallas_perm,
            (self.detector.height, self.detector.width),
            vol_shape,
            remap=self.pallas_remap,
        )
        # the Siddon/channel kernels align the window base down to a multiple
        # of 8 sublanes, which can cost up to 7 extra rows of reach
        if self.renderer == "siddon_pallas" or self.labels is not None:
            span += 7.0
        window = int(-(-max(span, 1.0) // quantum) * quantum)
        return min(window, int(vol_shape[1]))

    # -- geometry passthrough ------------------------------------------------
    @property
    def affine_inverse(self) -> jnp.ndarray:
        Ainv = self.volume.affine_inverse
        if self.voxel_shift:
            Ainv = Ainv.at[:3, 3].add(self.voxel_shift)
        return Ainv

    def _oriented(self, pose: RigidTransform) -> RigidTransform:
        reorient = orientation_transform(self.volume.orientation, self.volume.affine.dtype)
        # camera-frame pre-rotation: applied before the user pose
        return RigidTransform(jnp.matmul(pose.matrix, reorient.matrix, precision="highest"))

    def rays(self, pose: RigidTransform, calibration=None):
        """(source, target) world-space ray endpoints (trainer.py:283)."""
        return self.detector.rays(self._oriented(pose), calibration)

    def rays_host(self, pose: RigidTransform):
        """Host-side NumPy ray endpoints for kernel window/steepness
        measurements — avoids shipping (B, H*W, 3) probe arrays through a
        remote-device transport. Only the (B, 4, 4) pose matrices are
        fetched."""
        import numpy as np

        M = np.asarray(jax.device_get(_batched(pose).matrix), np.float64)
        F = np.asarray(
            jax.device_get(orientation_transform(self.volume.orientation).matrix),
            np.float64,
        )
        return self.detector.rays_numpy(M @ F)

    def affine_inverse_host(self):
        import numpy as np

        return np.asarray(jax.device_get(self.affine_inverse), np.float32)

    def perspective_projection(self, pose: RigidTransform, pts: jnp.ndarray) -> jnp.ndarray:
        return self.detector.perspective_projection(self._oriented(pose), pts)

    def inverse_projection(self, pose: RigidTransform, pts: jnp.ndarray) -> jnp.ndarray:
        return self.detector.inverse_projection(self._oriented(pose), pts)

    # -- rendering -----------------------------------------------------------
    def pack_for_pallas(self, density: jnp.ndarray | None = None):
        """Pre-pack a density grid for the Pallas renderer (hoist out of
        optimization loops; pass the result to render_rays/__call__)."""
        from .pallas import pack_density

        density = self.density if density is None else density
        if self.pallas_perm is None:
            raise ValueError("pack_for_pallas requires pallas_perm (use with_pallas)")
        return pack_density(density, self.pallas_perm)

    def prepare_for_shearwarp(self, density: jnp.ndarray | None = None):
        """Pre-permute/cast a density grid for the shear-warp renderer (hoist
        out of optimization loops; pass via render_rays/__call__ ``prepared``).
        With a labelmap, builds the (C, M, Wd, L) per-channel masked stack."""
        from .shearwarp import prepare_shearwarp

        density = self.density if density is None else density
        if self.pallas_perm is None:
            raise ValueError("prepare_for_shearwarp requires pallas_perm (use with_shearwarp)")
        mask = self.volume.mask if self.labels is not None else None
        return prepare_shearwarp(density, self.pallas_perm, mask=mask, labels=self.labels)

    def render_rays(
        self,
        source: jnp.ndarray,
        target: jnp.ndarray,
        density: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        packed=None,
        prepared=None,
    ) -> jnp.ndarray:
        """Integrate rays given world-space endpoints.

        Contract of ``drr.renderer(density, source, target, img, mask=seg)``
        (trainer.py:288). Returns (B, R) or (B, C, R) with a labelmap.
        """
        density = self.density if density is None else density
        mask = self.volume.mask if mask is None else mask
        labels = self.labels if mask is not None else None
        if self.renderer in (
            "trilinear_shearwarp", "trilinear_fast",
            "siddon_shearwarp", "siddon_fast",
        ):
            from .shearwarp import (
                raymarch_trilinear_fast,
                raymarch_trilinear_shearwarp,
            )

            # Siddon flavor = narrow trapezoid profile (piecewise-constant
            # model, quarter-voxel transverse smoothing); trilinear = tent
            eps = 0.25 if self.renderer.startswith("siddon") else 1.0
            kwargs = dict(
                det_shape=(self.detector.height, self.detector.width),
                perm=self.pallas_perm,
                prepared=prepared,
                grid_shape=self.shearwarp_grid,
                warp_window=self.shearwarp_window,
                mask=mask, labels=labels, eps=eps,
                chan_bounds=self.shearwarp_bounds if labels is not None else None,
                warp_remap=self.shearwarp_remap,
            )
            if self.renderer.endswith("_fast"):
                return raymarch_trilinear_fast(
                    density, self.affine_inverse, source, target,
                    packed=packed, slab_window=self.pallas_window, **kwargs,
                )
            return raymarch_trilinear_shearwarp(
                density, self.affine_inverse, source, target, **kwargs
            )
        if self.renderer in ("trilinear", "trilinear_pallas"):
            if self.renderer == "trilinear_pallas":
                from .pallas import raymarch_trilinear_pallas

                return raymarch_trilinear_pallas(
                    density, self.affine_inverse, source, target,
                    n_samples=self.n_samples, mask=mask, labels=labels,
                    det_shape=(self.detector.height, self.detector.width),
                    window=self.pallas_window,
                    perm=self.pallas_perm,
                    packed=packed,
                    remap=self.pallas_remap,
                )
            return xla.raymarch_trilinear(
                density, self.affine_inverse, source, target,
                n_samples=self.n_samples, mask=mask, labels=labels,
            )
        if self.renderer in ("siddon", "siddon_pallas"):
            if self.renderer == "siddon_pallas":
                from .pallas import raymarch_siddon_pallas

                return raymarch_siddon_pallas(
                    density, self.affine_inverse, source, target,
                    mask=mask, labels=labels,
                    det_shape=(self.detector.height, self.detector.width),
                    window=self.pallas_window,
                    perm=self.pallas_perm,
                    packed=packed,
                    remap=self.pallas_remap,
                )
            return xla.raymarch_siddon(
                density, self.affine_inverse, source, target, mask=mask, labels=labels,
            )
        raise ValueError(f"Unknown renderer {self.renderer!r}")

    def reshape_transform(self, img: jnp.ndarray, batch_size: int) -> jnp.ndarray:
        """Flat ray dim -> image (B, C, H, W) (trainer.py:289)."""
        H, W = self.detector.height, self.detector.width
        return img.reshape(batch_size, -1, H, W)

    def __call__(
        self,
        pose: RigidTransform,
        density: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        calibration=None,
        packed=None,
        prepared=None,
    ) -> jnp.ndarray:
        """Render DRRs at a batch of poses -> (B, C, H, W)."""
        squeeze = pose.matrix.ndim == 2
        if squeeze:
            pose = RigidTransform(pose.matrix[None])
        source, target = self.rays(pose, calibration)
        img = self.render_rays(
            source, target, density=density, mask=mask, packed=packed, prepared=prepared
        )
        img = self.reshape_transform(img, batch_size=pose.matrix.shape[0])
        return img[0] if squeeze else img

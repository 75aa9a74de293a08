"""The test-time optimization engine for 2D/3D registration.

TPU-first re-design of /root/reference/src/xvr/registrar/base.py:20-422. The
reference runs a Python loop of 500 CUDA iterations per pyramid stage; here an
entire stage — Adam ascent on (rotation, translation) against the image
similarity, ReduceLROnPlateau, plateau-counted early exit, and trajectory
recording — is ONE jitted ``lax.while_loop``, compiled once per pyramid scale
(scales are known up front, so executables are reused across X-rays).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import RigidTransform, convert
from ..metrics.ncc import gradient_ncc, multiscale_ncc
from ..render.load import initialize_drr
from ..render.projector import Projector
from ..utils.transforms import make_xray_transforms

# Placeholder intrinsics used before a real DICOM is parsed (base.py:93-109)
PLACEHOLDER = dict(height=1436, width=1436, sdd=1020.0, delx=0.194, dely=0.194)


def clinical_defaults(kwargs: dict) -> dict:
    """Defaults the concrete registrars flip relative to ``RegistrarBase``.

    Real clinical X-rays want log-linearization, the radiologic x-axis flip,
    and a shorter per-stage budget (the CNN/DICOM/fixed/restart seeds all
    start close); the base class keeps the renderer-neutral raw defaults.
    Explicitly passed values always win.
    """
    kwargs = dict(kwargs)
    kwargs.setdefault("linearize", True)
    kwargs.setdefault("n_itrs", "100")
    kwargs.setdefault("reverse_x_axis", True)
    return kwargs


@dataclass
class StageResult:
    rot: np.ndarray
    xyz: np.ndarray
    n_done: int
    params: np.ndarray  # (n_done, 6) euler ZXY + xyz after each step
    nccs: np.ndarray  # (n_done,) pre-step similarity
    lrs: np.ndarray  # (n_done, 2) effective (lr_rot, lr_xyz)
    runtime: float


def _parse_scales(scales: list[str] | str, crop: int, height: int) -> list[float]:
    """Per-stage absolute coarsening factors from full resolution.

    The reference chains relative detector rescales (base.py:402-407); the
    equivalent absolute factor for stage ``x`` is ``x * height / (height +
    crop)`` — i.e. a stage renders at ``(height + crop) / x`` pixels.
    """
    if isinstance(scales, str):
        scales = scales.split(",")
    return [float(x) * height / (height + crop) for x in scales]


def _drift_probes(pose: RigidTransform, rot_deg: float = 15.0, t_mm: float = 30.0) -> RigidTransform:
    """Probe poses covering where the optimizer can take ``pose`` within a
    stage: camera-frame rotation corners (+-rot_deg about every axis) at
    translation pushes of +-t_mm, around EVERY pose in the batch. Used to
    size the Pallas window so drift during the stage cannot clip the
    render."""
    rots, xyzs = [], []
    for sa in (-1.0, 1.0):
        for sb in (-1.0, 1.0):
            for sg in (-1.0, 1.0):
                for st in (-1.0, 1.0):
                    rots.append([sa * rot_deg, sb * rot_deg, sg * rot_deg])
                    xyzs.append([st * t_mm] * 3)
    dev = convert(
        jnp.asarray(rots, jnp.float32), jnp.asarray(xyzs, jnp.float32),
        "euler_angles", "ZXY", degrees=True,
    )
    mat = pose.matrix.reshape(-1, 4, 4)
    probes = mat[:, None] @ dev.matrix[None]
    return RigidTransform(probes.reshape(-1, 4, 4))


class RegistrarBase:
    """Shared machinery for all initial-pose strategies (base.py:20)."""

    def __init__(
        self,
        volume,
        mask=None,
        orientation: str | None = "AP",
        labels=None,
        crop: int = 0,
        subtract_background: bool = False,
        linearize: bool = False,
        equalize: bool = False,
        reducefn="max",
        scales: str = "8",
        n_itrs: str = "500",
        reverse_x_axis: bool = False,
        renderer: str = "trilinear",
        parameterization: str = "euler_angles",
        convention: str | None = "ZXY",
        voxel_shift: float = 0.0,
        lr_rot: float = 1e-2,
        lr_xyz: float = 1e0,
        patience: int = 10,
        threshold: float = 1e-4,
        max_n_plateaus: int = 3,
        max_restarts: int = 1,
        restart_seeds: int = 4,
        restart_jitter_rot: float = 1.0,
        restart_jitter_xyz: float = 4.0,
        coarse_seeds: int = 0,
        coarse_jitter_rot: float = 3.0,
        coarse_jitter_xyz: float = 10.0,
        init_only: bool = False,
        saveimg: bool = False,
        verbose: int = 1,
        read_kwargs: dict | None = None,
        drr_kwargs: dict | None = None,
        save_kwargs: dict | None = None,
        stage_warmup: int = 5,
        mesh=None,
    ):
        self.volume = volume
        self.mask = mask
        self.orientation = orientation
        self.labels = labels
        self.reverse_x_axis = reverse_x_axis
        self.renderer = renderer
        # optional device mesh: a batched registration shards its K X-rays
        # over every mesh axis (pure data parallelism — registration has no
        # cross-image math); None = single device
        self.mesh = mesh
        self.read_kwargs = read_kwargs or {}
        self.drr_kwargs = dict(drr_kwargs or {})
        self.drr_kwargs["voxel_shift"] = voxel_shift

        self.crop = crop
        self.subtract_background = subtract_background
        self.linearize = linearize
        self.equalize = equalize
        self.reducefn = reducefn

        self.parameterization = parameterization
        self.convention = convention

        self.scales = scales.split(",") if isinstance(scales, str) else list(scales)
        self.n_itrs = [int(n) for n in (n_itrs.split(",") if isinstance(n_itrs, str) else n_itrs)]
        assert len(self.scales) == len(self.n_itrs), "scales and n_itrs must align"

        self.lr_rot = lr_rot
        self.lr_xyz = lr_xyz
        self.patience = patience
        self.threshold = threshold
        self.max_n_plateaus = max_n_plateaus
        self.max_restarts = max_restarts
        self.restart_seeds = max(1, int(restart_seeds))
        self.restart_jitter_rot = restart_jitter_rot
        self.restart_jitter_xyz = restart_jitter_xyz
        # wide coarse-stage multi-start: > restart_seeds enables a basin
        # search at the coarsest pyramid scale only (see run_batch)
        self.coarse_seeds = int(coarse_seeds or 0)
        self.coarse_jitter_rot = coarse_jitter_rot
        self.coarse_jitter_xyz = coarse_jitter_xyz

        self.init_only = init_only
        self.saveimg = saveimg
        self.verbose = verbose
        self.stage_warmup = stage_warmup
        self.save_kwargs = save_kwargs or {}

        self.projector = initialize_drr(
            volume,
            mask,
            # --labels restricts the RENDERED structures (density outside
            # becomes air at read level, reference register.py:72 semantics);
            # the optimization still renders one plain image per pose.
            labels=self.labels,
            orientation=orientation,
            x0=0.0,
            y0=0.0,
            reverse_x_axis=reverse_x_axis,
            # "<family>_exact" pins the XLA golden renderer (exact models,
            # autodiff gradients) — the suffix opts out of the kernel-upgrade
            # block below, which only fires for the bare family names
            renderer=renderer.removesuffix("_exact"),
            read_kwargs=self.read_kwargs,
            drr_kwargs=self.drr_kwargs,
            **PLACEHOLDER,
        )
        self._stage_cache: dict = {}
        # per-invocation kernel-window memo: measured on the first pass,
        # reused on restart passes (see run_test_time_optimization)
        self._pass_windows: dict = {}
        self._stage_compiles = 0  # executables built vs reused (perf telemetry)

    @property
    def stage_compiles(self) -> int:
        """Pyramid-stage executables compiled so far (cache misses). A sweep
        over many X-rays at the same intrinsics should compile each stage
        once; this counter is the bench's evidence."""
        return self._stage_compiles

    # ------------------------------------------------------------------
    def initialize_pose(self, i2d):
        """-> (gt, sdd, delx, dely, x0, y0, pf_to_af, init_pose)."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    def _make_stage(self, projector: Projector, n_itr: int, mncc_patch_size, gncc_patch_size, sigma, beta):
        """Compile one pyramid stage as a single on-device while_loop."""
        H, W = projector.detector.height, projector.detector.width
        transform = make_xray_transforms(H, W, use_equalize=self.equalize)
        parameterization = self.parameterization
        convention = self.convention
        patience = self.patience
        threshold = self.threshold
        max_n_plateaus = self.max_n_plateaus
        warmup = float(self.stage_warmup)
        b1, b2, eps = 0.9, 0.999, 1e-8

        def imagesim(x, y):
            # per-image similarities, shape (K,) — the stage is natively
            # batched over X-rays (renders are independent per pose, so one
            # batched render per iteration feeds K registrations at once)
            s = beta * multiscale_ncc(x, y, (None, mncc_patch_size), (0.5, 0.5))
            if beta < 1.0:
                s = s + (1.0 - beta) * gradient_ncc(x, y, gncc_patch_size, sigma)
            return s

        use_pallas = projector.renderer == "trilinear_pallas"
        use_fast = projector.renderer.endswith("_fast")

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh_axes = tuple(mesh.axis_names)

            def shard_k(x):
                # K (image) axis over EVERY mesh axis: registration is pure
                # data parallelism, so a (dp, rays) training mesh flattens
                spec = P(mesh_axes, *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

            def sharded_fast_render(pose, density, prepared):
                """Two fast-render layouts, picked by the stage batch size:

                * B divisible by the mesh — shard_map over the flattened
                  axes: GSPMD cannot split the Pallas warp, so each device
                  renders its pose shard whole (same pattern as the
                  trainer's _sharded_fast_render). Zero intra-render
                  communication; the BEST strategy whenever K*S >= devices.
                * otherwise — the renders themselves are split:
                  parallel.ray_sharded_fast_render row-blocks the detector
                  warp over the mesh (equality + grad vs unsharded tested by
                  tests/test_parallel.py::test_shard_rays_fast_render_matches_unsharded),
                  so a SINGLE registration (K=1) uses every chip instead of
                  being padded out with duplicate images. Requires the plain
                  warp layout — the extreme-roll remap derives per-column
                  shifts from the local ray block (docs/performance.md)."""
                B = pose.matrix.shape[0]
                if B % mesh.size and not projector.shearwarp_remap:
                    from ..parallel.mesh import ray_sharded_fast_render

                    raw = ray_sharded_fast_render(
                        mesh, projector, pose, density=density, prepared=prepared
                    )
                    return projector.reshape_transform(raw, B)
                if B % mesh.size:
                    # remap layout + indivisible batch: render replicated
                    # (correct everywhere, no scale-out for this stage)
                    src, tgt = projector.rays(pose)
                    raw = projector.render_rays(
                        src, tgt, density=density, prepared=prepared
                    )
                    return projector.reshape_transform(raw, B)

                def body(pose_mat, density, prepared):
                    src, tgt = projector.rays(RigidTransform(pose_mat))
                    return projector.render_rays(
                        src, tgt, density=density, prepared=prepared
                    )

                raw = jax.shard_map(
                    body, mesh=mesh,
                    in_specs=(P(mesh_axes), P(), P()),
                    out_specs=P(mesh_axes),
                    check_vma=False,  # custom_vjp inside the body
                )(pose.matrix, density, prepared)
                return projector.reshape_transform(raw, pose.matrix.shape[0])

        def loss_fn(rot, xyz, gt, density, packed, prepared):
            pose = convert(rot, xyz, parameterization=parameterization, convention=convention)
            divisible = mesh is not None and rot.shape[0] % mesh.size == 0
            if mesh is not None and use_fast:
                img = sharded_fast_render(pose, density, prepared)
            elif divisible and not use_pallas:
                # XLA renderer: sharding constraints are enough (GSPMD
                # splits the per-image ray math); pallas slab stays
                # replicated — the registrar prefers the shear-warp path
                pose = RigidTransform(shard_k(pose.matrix))
                img = projector(pose, density=density, packed=packed, prepared=prepared)
            else:
                img = projector(pose, density=density, packed=packed, prepared=prepared)
            sims = imagesim(gt, transform(img))
            # summing decouples: d(sum)/d(rot[k]) touches only image k
            return sims.sum(), sims

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

        @jax.jit
        def stage(rot, xyz, gt, density, lr_rot, lr_xyz):
            # pack/permute the volume ONCE per stage (hoisted out of the
            # while_loop); the fast renderer needs both layouts (shear-warp
            # slices forward, pair-packed table for the analytic backward)
            packed = projector.pack_for_pallas(density) if use_pallas else None
            prepared = projector.prepare_for_shearwarp(density) if use_fast else None
            if mesh is not None and rot.shape[0] % mesh.size == 0:
                # shard the image axis up front; the (K,)-leaved plateau
                # state inherits the layout through the while_loop. A batch
                # that does NOT divide the mesh stays replicated (the tiny
                # per-image optimizer state costs nothing); its fast renders
                # are ray-sharded instead — see sharded_fast_render
                rot, xyz, gt = shard_k(rot), shard_k(xyz), shard_k(gt)
            K = rot.shape[0]
            fdt = rot.dtype
            # Adam moments
            m_r = jnp.zeros_like(rot); v_r = jnp.zeros_like(rot)
            m_x = jnp.zeros_like(xyz); v_x = jnp.zeros_like(xyz)
            traj = jnp.zeros((n_itr, K, 6), fdt)
            nccs = jnp.zeros((n_itr, K), fdt)
            lrs = jnp.zeros((n_itr, K, 2), fdt)

            # per-image plateau state machine (torch ReduceLROnPlateau,
            # mode=max, factor=0.1, rel threshold + the reference's lr-drop
            # counter initialized at +inf so the first step counts one
            # plateau, base.py:238,270-277). An image whose plateau budget is
            # exhausted freezes in place; the loop runs until every image is
            # done (or n_itr).
            state = dict(
                itr=jnp.asarray(0),
                rot=rot, xyz=xyz,
                # best-similarity pose seen this stage: returned instead of
                # the last pose (IMPROVEMENT over the reference, which keeps
                # the final iterate — Adam's first fresh-moment step can kick
                # the pose off a good optimum and a plateau exit then locks
                # the damage in; keeping the argmax is strictly better)
                b_rot=rot, b_xyz=xyz,
                best_raw=jnp.full((K,), -jnp.inf, fdt),
                m_r=m_r, v_r=v_r, m_x=m_x, v_x=v_x,
                lr_scale=jnp.ones((K,), fdt),
                best=jnp.full((K,), -jnp.inf, fdt),
                num_bad=jnp.zeros((K,), jnp.int32),
                n_plateaus=jnp.zeros((K,), jnp.int32),
                current_lr=jnp.full((K,), jnp.inf, fdt),
                done_itr=jnp.full((K,), n_itr, jnp.int32),
                traj=traj, nccs=nccs, lrs=lrs,
            )

            def cond(s):
                return (s["itr"] < n_itr) & jnp.any(s["n_plateaus"] < max_n_plateaus)

            def body(s):
                i = s["itr"]
                t = (i + 1).astype(fdt)
                live = s["n_plateaus"] < max_n_plateaus  # (K,)
                (_, loss), (g_r, g_x) = grad_fn(
                    s["rot"], s["xyz"], gt, density, packed, prepared
                )

                def adam(p, m, v, g, lr):
                    m = b1 * m + (1 - b1) * g
                    v = b2 * v + (1 - b2) * g * g
                    mhat = m / (1 - b1**t)
                    vhat = v / (1 - b2**t)
                    return p + lr[:, None] * mhat / (jnp.sqrt(vhat) + eps), m, v  # ascent

                def frozen(new, old):
                    keep = live.reshape((K,) + (1,) * (new.ndim - 1))
                    return jnp.where(keep, new, old)

                # Per-stage lr warmup (IMPROVEMENT over the reference):
                # Adam's first steps with fresh moments move a full +-lr per
                # component regardless of gradient magnitude, kicking a
                # well-initialized pose off its optimum; ramping over the
                # first few iterations removes the kick without changing the
                # steady-state step size.
                warm = jnp.minimum((i + 1.0) / warmup, 1.0)
                lr_r = lr_rot * s["lr_scale"] * warm  # (K,)
                lr_x = lr_xyz * s["lr_scale"] * warm
                rot2, m_r2, v_r2 = adam(s["rot"], s["m_r"], s["v_r"], g_r, lr_r)
                xyz2, m_x2, v_x2 = adam(s["xyz"], s["m_x"], s["v_x"], g_x, lr_x)
                rot2, m_r2, v_r2 = frozen(rot2, s["rot"]), frozen(m_r2, s["m_r"]), frozen(v_r2, s["v_r"])
                xyz2, m_x2, v_x2 = frozen(xyz2, s["xyz"]), frozen(m_x2, s["m_x"]), frozen(v_x2, s["v_x"])

                # argmax-pose tracking (loss is evaluated at the PRE-step pose)
                raw_improved = (loss > s["best_raw"]) & live
                best_raw = jnp.where(raw_improved, loss, s["best_raw"])
                b_rot = jnp.where(raw_improved[:, None], s["rot"], s["b_rot"])
                b_xyz = jnp.where(raw_improved[:, None], s["xyz"], s["b_xyz"])

                # scheduler.step(loss)
                improved = loss > s["best"] * (1.0 + threshold)
                best = jnp.where(improved & live, loss, s["best"])
                # lr-warmup iterations don't tick the staleness counter: the
                # ramp's tiny steps can't produce threshold-sized gains, and
                # letting them burn patience hands the scheduler a head start
                # toward a spurious plateau (the warmup itself is our
                # addition — the reference has no ramp to account for)
                ticking = live & (i + 1.0 >= warmup)
                num_bad = jnp.where(ticking, jnp.where(improved, 0, s["num_bad"] + 1), s["num_bad"])
                reduce = (num_bad > patience) & live
                lr_scale = jnp.where(reduce, s["lr_scale"] * 0.1, s["lr_scale"])
                num_bad = jnp.where(reduce, 0, num_bad)

                # plateau counting on observed lr drops (incl. the initial one)
                lr_now = lr_rot * lr_scale
                dropped = (lr_now < s["current_lr"]) & live
                current_lr = jnp.where(dropped, lr_now, s["current_lr"])
                n_plateaus = s["n_plateaus"] + dropped.astype(s["n_plateaus"].dtype)
                newly_done = (n_plateaus >= max_n_plateaus) & live
                done_itr = jnp.where(newly_done, i + 1, s["done_itr"])

                # record (pose after the step, similarity before it)
                pose2 = convert(rot2, xyz2, parameterization=parameterization, convention=convention)
                e_rot, e_xyz = pose2.convert("euler_angles", "ZXY")
                rows = jnp.concatenate(
                    [e_rot.reshape(K, -1)[:, :3], e_xyz.reshape(K, -1)[:, :3]], axis=1
                )
                return dict(
                    itr=i + 1, rot=rot2, xyz=xyz2,
                    b_rot=b_rot, b_xyz=b_xyz, best_raw=best_raw,
                    m_r=m_r2, v_r=v_r2, m_x=m_x2, v_x=v_x2,
                    lr_scale=lr_scale, best=best, num_bad=num_bad,
                    n_plateaus=n_plateaus, current_lr=current_lr,
                    done_itr=done_itr,
                    traj=s["traj"].at[i].set(rows),
                    nccs=s["nccs"].at[i].set(loss),
                    lrs=s["lrs"].at[i].set(jnp.stack([lr_r, lr_x], axis=1)),
                )

            out = jax.lax.while_loop(cond, body, state)
            # the loop records PRE-step losses, so the final iterate was never
            # scored: evaluate it, and return whichever of (last, argmax) pose
            # is actually better, per image
            _, last_ncc = loss_fn(out["rot"], out["xyz"], gt, density, packed, prepared)
            use_last = last_ncc >= out["best_raw"]
            rot_out = jnp.where(use_last[:, None], out["rot"], out["b_rot"])
            xyz_out = jnp.where(use_last[:, None], out["xyz"], out["b_xyz"])
            final_ncc = jnp.maximum(last_ncc, out["best_raw"])
            n_done = jnp.minimum(out["done_itr"], out["itr"])
            return (
                rot_out, xyz_out, n_done,
                out["traj"], out["nccs"], out["lrs"], final_ncc,
            )

        return stage, transform

    # ------------------------------------------------------------------
    def run_test_time_optimization(self, gt, init_pose, scales, imagesim_cfg):
        """Multiscale refinement (base.py:198-292 semantics), batched over K
        X-rays: every pyramid stage renders all K poses in ONE batched call
        per iteration, so registering a whole fluoro sequence costs little
        more than one image (the reference fans the same sweep out over SLURM
        job arrays, one GPU per X-ray). Per-image plateau state; an image
        that exhausts its plateau budget freezes while the rest continue.

        -> (final_pose [K poses], params_rows, nccs, times, alphas — each a
        length-K list of per-image records)
        """
        rot, xyz = init_pose.convert(self.parameterization, self.convention)
        gt = jnp.asarray(gt)
        K = gt.shape[0]
        assert rot.shape[0] == K, (rot.shape, gt.shape)

        e_rot, e_xyz = init_pose.convert("euler_angles", "ZXY")
        e0 = np.concatenate(
            [np.asarray(e_rot).reshape(K, -1)[:, :3], np.asarray(e_xyz).reshape(K, -1)[:, :3]],
            axis=1,
        )
        params_rows = [[e0[k].tolist()] for k in range(K)]
        nccs: list[list[float]] = [[] for _ in range(K)]
        times: list[list[float]] = [[0.0] for _ in range(K)]
        alphas = [[[self.lr_rot, self.lr_xyz]] for _ in range(K)]

        step_size_scalar = 1.0
        final_ncc = None
        # Window-probe envelope: per-stage optimizer drift (+-15 deg/30 mm)
        # PLUS the configured restart jitter. The memoized pass-1 windows are
        # reused verbatim on restart passes, whose seeds scatter around the
        # pass-1 final pose by restart_jitter_rot/xyz — with a large jitter
        # (e.g. 25 deg/60 mm in the multistart tests) an envelope sized for
        # drift alone would let the warp/Pallas window silently clip ray
        # accumulation on those passes.
        will_jitter = self.restart_seeds > 1 or self.max_restarts > 0
        probe_rot = 15.0 + (self.restart_jitter_rot if will_jitter else 0.0)
        probe_t = 30.0 + (self.restart_jitter_xyz if will_jitter else 0.0)
        for stage_idx, (scale, n_itr) in enumerate(zip(scales, self.n_itrs), start=1):
            proj = self.projector.rescale_detector(scale)
            # Per-stage kernel windows are measured from the CURRENT pose —
            # which, on a restart pass, is the data-dependent result of the
            # previous pass. FP wobble across runs can then cross a window
            # quantum, changing the stage's static HLO and defeating the
            # persistent compilation cache (observed: 3 restart-stage
            # recompiles per fresh process, ~30 s each through the tunnel).
            # Measure ONCE per (stage, detector) from the first pass's pose,
            # over the drift+jitter envelope above, and reuse on later passes.
            wkey = (stage_idx, proj.detector.height, proj.detector.width)
            cached_w = getattr(self, "_pass_windows", {}).get(wkey)
            if cached_w is not None:
                if proj.renderer == "trilinear_pallas":
                    proj = proj.replace(pallas_window=cached_w[0], pallas_remap=cached_w[1])
                elif proj.renderer.endswith("_fast"):
                    proj = proj.replace(shearwarp_window=cached_w[0])
            elif proj.renderer == "trilinear_pallas":
                # exact Pallas window + ray layout for THIS stage's detector,
                # measured over the current pose plus the drift the optimizer
                # may apply — an undersized window silently clips ray
                # contributions. quantum=16 keeps the compile cache warm
                # across X-rays.
                pose_now = convert(
                    rot, xyz, parameterization=self.parameterization,
                    convention=self.convention,
                )
                proj = proj.tuned_for(
                    _drift_probes(pose_now, probe_rot, probe_t), quantum=16
                )
                self._pass_windows[wkey] = (proj.pallas_window, proj.pallas_remap)
            elif proj.renderer.endswith("_fast"):
                # per-stage warp window for the shear-warp forward (the
                # analytic adjoint backward shares its geometry)
                from ..render.shearwarp import measured_warp_window

                pose_now = convert(
                    rot, xyz, parameterization=self.parameterization,
                    convention=self.convention,
                )
                probes = _drift_probes(pose_now, probe_rot, probe_t)
                # ray generation AND the span measurement run on device (the
                # host NumPy version dominated warm batched registration:
                # K x 16 probes x stage-resolution rays per stage)
                src_p, tgt_p = proj.rays(probes)
                warp_w = measured_warp_window(
                    src_p, tgt_p, proj.affine_inverse,
                    proj.pallas_perm,
                    (proj.detector.height, proj.detector.width),
                    proj.shearwarp_grid,
                    remap=proj.shearwarp_remap,
                )
                proj = proj.replace(shearwarp_window=int(-(-warp_w // 16) * 16))
                self._pass_windows[wkey] = (proj.shearwarp_window,)
            # every value _make_stage closes over must key the cache: the
            # cache may be SHARED across registrar instances (e.g. a bench
            # harness reusing compiled stages between engines), so config
            # baked into the stage closure but missing here would silently
            # run one registrar with another's optimizer/preprocessing
            key = (
                proj.detector, proj.renderer, proj.pallas_perm,
                proj.pallas_window, proj.pallas_remap,
                proj.shearwarp_window, proj.shearwarp_grid,
                proj.shearwarp_remap, proj.shearwarp_bounds, n_itr, imagesim_cfg,
                K, self.equalize, self.parameterization, self.convention,
                self.patience, self.threshold, self.max_n_plateaus,
                self.stage_warmup,
            )
            if key not in self._stage_cache:
                self._stage_cache[key] = self._make_stage(proj, n_itr, *imagesim_cfg)
                self._stage_compiles += 1
            stage_fn, transform = self._stage_cache[key]

            gt_stage = transform(gt)
            step_size_scalar *= 2 ** (stage_idx - 1)
            lr_rot = self.lr_rot / step_size_scalar
            lr_xyz = self.lr_xyz / step_size_scalar

            t0 = time.perf_counter()
            rot, xyz, n_done, traj, stage_nccs, stage_lrs, final_ncc = jax.device_get(
                stage_fn(rot, xyz, gt_stage, proj.density, lr_rot, lr_xyz)
            )
            t1 = time.perf_counter()
            n_done = np.asarray(n_done)  # (K,)
            rot, xyz = jnp.asarray(rot), jnp.asarray(xyz)

            per_itr = (t1 - t0) / max(int(n_done.max()), 1)
            for k in range(K):
                nk = int(n_done[k])
                params_rows[k].extend(np.asarray(traj[:nk, k]).tolist())
                nccs[k].extend(np.asarray(stage_nccs[:nk, k]).tolist())
                times[k].extend([per_itr] * nk)
                alphas[k].extend(np.asarray(stage_lrs[:nk, k]).tolist())
            if self.verbose > 0:
                done_str = "/".join(str(int(n)) for n in n_done)
                ncc_str = "/".join(f"{float(v):.4f}" for v in np.asarray(final_ncc))
                # window by ACTIVE renderer (shearwarp_window defaults to 48,
                # so falling back through `or` would mislabel the Pallas/XLA
                # paths with a warp window they never use)
                if proj.renderer.endswith(("_fast", "_shearwarp")):
                    win = proj.shearwarp_window
                elif proj.renderer == "trilinear_pallas":
                    win = proj.pallas_window
                else:
                    win = None
                print(
                    f"Stage {stage_idx}: {done_str}/{n_itr} itrs @ {proj.detector.height}x"
                    f"{proj.detector.width}, ncc={ncc_str}, "
                    f"{per_itr * 1e3:.1f} ms/itr"
                    + (f", window={win}" if win else ""),
                    flush=True,
                )

        for k in range(K):
            nccs[k].append(float(np.asarray(final_ncc)[k]))
        final_pose = convert(
            rot, xyz, parameterization=self.parameterization, convention=self.convention
        )
        return final_pose, params_rows, nccs, times, alphas

    # ------------------------------------------------------------------
    def run(self, i2d, mncc_patch_size=9, gncc_patch_size=11, sigma=0.0, beta=0.5):
        """Register ONE X-ray (= the K=1 case of :meth:`run_batch`)."""
        return self.run_batch([i2d], mncc_patch_size, gncc_patch_size, sigma, beta)[0]

    # ------------------------------------------------------------------
    def run_batch(self, i2ds, mncc_patch_size=9, gncc_patch_size=11, sigma=0.0, beta=0.5):
        """Register K X-rays sharing intrinsics in ONE batched optimization.

        Every pyramid-stage iteration renders all K candidate poses in one
        batched call; throughput approaches K single registrations for the
        price of one. All X-rays must share detector shape and intrinsics
        (true of a fluoro sequence / a dataset sweep) — a ValueError names
        the mismatch otherwise. Returns a list of K per-image result tuples,
        each shaped exactly like a single :meth:`run` result.
        """
        n_files = len(i2ds)
        # new X-rays, new init poses: measure this invocation's stage windows
        # afresh on pass 1 (restart passes then reuse them)
        self._pass_windows = {}
        if self.mesh is not None and n_files % self.mesh.size:
            if n_files * self.restart_seeds < self.mesh.size:
                # small-K on a big mesh: DON'T pad with duplicate images —
                # the stage renders are ray-sharded over the mesh instead
                # (parallel.ray_sharded_fast_render splits each render's
                # detector rows), so a single registration uses every chip
                # without K*S duplicated warps
                pass
            else:
                # pad to a full device complement (results for the repeats
                # are computed and dropped); callers chunking by max_batch
                # should align max_batch to the mesh size to avoid the waste
                pad = self.mesh.size - n_files % self.mesh.size
                i2ds = list(i2ds) + [i2ds[-1]] * pad

        inits = [self.initialize_pose(i2d) for i2d in i2ds]
        intrs = [tuple(float(v) for v in x[1:6]) for x in inits]  # sdd..y0
        shapes = [tuple(x[0].shape[-2:]) for x in inits]
        if len(set(intrs)) != 1 or len(set(shapes)) != 1:
            raise ValueError(
                "run_batch requires every X-ray to share intrinsics and shape; got "
                f"(sdd, delx, dely, x0, y0) in {sorted(set(intrs))} and shapes {sorted(set(shapes))}"
            )
        sdd, delx, dely, x0, y0 = intrs[0]
        pf_to_afs = [x[6] for x in inits]
        gt = jnp.concatenate([jnp.asarray(x[0]) for x in inits], axis=0)  # (K,1,H,W)
        init_pose = RigidTransform(
            jnp.concatenate([x[7].matrix.reshape(-1, 4, 4) for x in inits], axis=0)
        )
        K = gt.shape[0]
        H, W = gt.shape[-2:]
        intrinsics = dict(
            sdd=sdd, height=H, width=W, delx=delx, dely=dely, x0=-x0, y0=y0
        )  # NOTE the x0 sign flip, base.py:147

        scales = _parse_scales(self.scales, self.crop, H)
        self.projector = self.projector.set_intrinsics(**intrinsics)

        # TPU fast path: fix the Pallas kernel's march axis from the initial
        # pose (optimization stays within a few degrees of it per stage)
        import os as _os

        if (
            self.renderer in ("trilinear", "siddon")
            and (
                jax.default_backend() == "tpu"
                # the shear-warp path is plain XLA and runs anywhere; the
                # TPU gate only reflects where it is the RIGHT default.
                # Tests force it on CPU to compare fast-vs-exact accuracy.
                or _os.environ.get("XVR_FORCE_SHEARWARP")
            )
            and not _os.environ.get("XVR_NO_PALLAS")
        ):
            # decide march axis + check the steepness regime on the coarsest
            # stage (cheap rays); exact windows are re-measured per stage
            if not _os.environ.get("XVR_NO_SHEARWARP"):
                # shear-warp MXU forward + the analytic shear-warp adjoint
                # backward (backward="slab" remains a cross-check option);
                # --renderer siddon upgrades to the siddon-flavored profile
                coarse = self.projector.rescale_detector(scales[0]).with_shearwarp(
                    init_pose
                )
                if coarse.renderer.endswith("_fast"):
                    self.projector = self.projector.replace(
                        renderer=coarse.renderer,
                        pallas_perm=coarse.pallas_perm,
                        pallas_window=coarse.pallas_window,
                        pallas_remap=False,
                        # carry the warp-layout decision (extreme-roll barrel
                        # shift); per-stage windows re-measure under it
                        shearwarp_remap=coarse.shearwarp_remap,
                    )
            if self.projector.renderer == "trilinear":
                coarse = self.projector.rescale_detector(scales[0]).with_pallas(init_pose)
                if coarse.renderer == "trilinear_pallas":
                    self.projector = self.projector.replace(
                        renderer="trilinear_pallas",
                        pallas_perm=coarse.pallas_perm,
                        pallas_window=coarse.pallas_window,
                    )

        if self.init_only:
            proj = self.projector.rescale_detector(scales[0])
            return [
                (gt[k : k + 1], intrinsics, proj, init_pose[k : k + 1], None,
                 dict(pf_to_af=pf_to_afs[k]))
                for k in range(K)
            ][:n_files]

        t0 = time.perf_counter()
        imagesim_cfg = (mncc_patch_size, gncc_patch_size, sigma, beta)

        # MULTI-START optimization: every pass — the first included — runs
        # ``restart_seeds`` starts per image (the current pose plus S-1
        # jittered copies), batched through one pyramid. A K*S-pose render
        # costs little more than K poses on the MXU, and because pass 1 and
        # every re-anneal share the same K*S batch shape they share stage
        # executables — 3 per scale set instead of 6, at ~20 s per
        # executable load through a remote-TPU tunnel. Seed 0 of every pass
        # is the unperturbed pose and a jittered start must win the argmax
        # by the plateau threshold, so each pass can never end worse than
        # its single-start counterpart; the spread is what converts the
        # ~2 mm draws that plateau-counted early exit (a high-variance
        # stopping rule the reference inherits, exposing `register restart`
        # as a manual second pass) leaves behind into sub-mm finals.
        S = self.restart_seeds
        gt_ms = jnp.repeat(gt, S, axis=0) if S > 1 else gt

        def _seed_poses(base_pose, pass_idx, n_seeds=None, jitter_rot=None, jitter_xyz=None):
            n_seeds = S if n_seeds is None else n_seeds
            jitter_rot = self.restart_jitter_rot if jitter_rot is None else jitter_rot
            jitter_xyz = self.restart_jitter_xyz if jitter_xyz is None else jitter_xyz
            e_rot, e_xyz = base_pose.convert("euler_angles", "ZXY")
            rot_s = np.repeat(np.asarray(e_rot).reshape(K, -1)[:, :3], n_seeds, axis=0)
            xyz_s = np.repeat(np.asarray(e_xyz).reshape(K, -1)[:, :3], n_seeds, axis=0)
            if n_seeds > 1:
                # deterministic jitter (seeded by pass index): seeds k*S+1..
                # k*S+S-1 perturb image k's pose; seed k*S is left exact.
                # ONE shared (n_seeds-1, 3) jitter table tiled over images —
                # search diversity lives across SEEDS, not images, and the
                # shared table keeps an image's result independent of its
                # batch position (duplicated rows of a run_batch follow
                # identical trajectories; K=1 draws are unchanged —
                # tests/test_parallel.py::test_mesh_batched_registration)
                prng = np.random.default_rng(1000 + pass_idx)
                jit = (np.arange(K * n_seeds) % n_seeds) != 0
                j_rot = np.deg2rad(
                    prng.uniform(-jitter_rot, jitter_rot, (n_seeds - 1, 3))
                )
                j_xyz = prng.uniform(-jitter_xyz, jitter_xyz, (n_seeds - 1, 3))
                rot_s[jit] += np.tile(j_rot, (K, 1))
                xyz_s[jit] += np.tile(j_xyz, (K, 1))
            return convert(
                jnp.asarray(rot_s, jnp.float32), jnp.asarray(xyz_s, jnp.float32),
                "euler_angles", "ZXY",
            )

        def _select(r_nccs):
            """Per-image argmax over seeds, with the unperturbed seed as the
            handicap favorite: a jittered start must win by a MATERIAL
            margin, because near-degenerate pose directions (depth along the
            beam above all) tie the similarity to within noise while
            differing by mm of 3D error. Material NCC gains DO track
            accuracy — cone-beam magnification observes even depth, weakly —
            so the handicap only filters the noise ties. The plateau
            threshold is exactly the engine's notion of "material" (additive
            — NCC is bounded in [-1, 1])."""
            fin = np.asarray([r_nccs[j][-1] for j in range(K * S)]).reshape(K, S)
            handicapped = fin.copy()
            handicapped[:, 1:] -= self.threshold
            best_s = handicapped.argmax(axis=1)
            return best_s, fin[np.arange(K), best_s]

        # ---- wide coarse-stage multi-start (optional basin search) --------
        # The ~2 mm tail of the final-mTRE distribution comes from pass 1
        # committing to a wrong coarse basin that every later stage then
        # polishes. A Sc-seed sweep of the COARSEST stage only is nearly free
        # on the MXU (the coarse detector is tiny and the K*Sc batch rides
        # the same slope-space matmuls), so when coarse_seeds > restart_seeds
        # the engine first optimizes Sc wide-jittered starts through stage 1
        # and hands the best S of them (the unperturbed chain always kept in
        # slot 0, so the argmax handicap still protects the known-safe
        # continuation) to the full pyramid as its pass-1 starts.
        iters_pre = 0
        Sc = self.coarse_seeds
        if 0 < Sc <= S:
            # sweeping Sc starts only to keep S >= Sc of them would select
            # nothing — the sweep activates above restart_seeds; say so
            # instead of silently recording coarse_seeds in the bundle as if
            # it had run
            import warnings

            warnings.warn(
                f"coarse_seeds={Sc} <= restart_seeds={S} is a no-op: the "
                f"coarse sweep only runs when it is wider than the starts "
                f"kept for the full pyramid (set coarse_seeds > {S} to "
                f"enable it)",
                stacklevel=2,
            )
        if Sc > S and self.n_itrs:
            gt_c = jnp.repeat(gt, Sc, axis=0) if Sc > 1 else gt
            c_pose, _, c_nccs, _, _ = self.run_test_time_optimization(
                gt_c,
                _seed_poses(init_pose, 555, Sc, self.coarse_jitter_rot, self.coarse_jitter_xyz),
                scales[:1], imagesim_cfg,
            )
            iters_pre = max(len(c_nccs[j]) - 1 for j in range(K * Sc))
            fin_c = np.asarray([c_nccs[j][-1] for j in range(K * Sc)]).reshape(K, Sc)
            mats_c = np.asarray(c_pose.matrix).reshape(K, Sc, 4, 4)
            starts = np.empty((K, S, 4, 4), np.float32)
            for k in range(K):
                order = 1 + np.argsort(-fin_c[k, 1:])  # best jittered first
                pick = [0] + order[: S - 1].tolist()
                starts[k] = mats_c[k, pick]
            pass1_starts = RigidTransform(jnp.asarray(starts.reshape(K * S, 4, 4)))
            if self.verbose > 0:
                spread = "/".join(
                    f"{fin_c[k].max() - fin_c[k, 0]:+.4f}" for k in range(K)
                )
                print(f"Coarse sweep ({Sc} seeds): best-vs-exact ncc {spread}", flush=True)
        else:
            pass1_starts = _seed_poses(init_pose, 999)

        # ---- pass 1: multi-start from the initial poses -------------------
        r_pose, r_params, r_nccs, r_times, r_alphas = (
            self.run_test_time_optimization(
                gt_ms, pass1_starts, scales, imagesim_cfg
            )
        )
        best_s, cur_ncc = _select(r_nccs)
        sel = np.arange(K) * S + best_s
        final_pose = RigidTransform(
            jnp.asarray(np.asarray(r_pose.matrix).reshape(K * S, 4, 4)[sel])
        )
        # per-image records = the winning seed's trajectory. Row 0 is that
        # start's initial state: the true init for seed 0, the jittered pose
        # for a jittered winner (the bundle records the true init separately;
        # the trajectory stays truthful about where the optimizer went).
        params, nccs, times, alphas = [], [], [], []
        for k in range(K):
            j = int(k * S + best_s[k])
            params.append(list(r_params[j]))
            nccs.append(list(r_nccs[j]))
            times.append(list(r_times[j]))
            alphas.append(list(r_alphas[j]))
        iters_run = iters_pre + max(len(r_nccs[j]) - 1 for j in range(K * S))

        # ---- objective-gated re-anneal passes ------------------------------
        for restart_idx in range(self.max_restarts):
            prev_ncc = np.asarray([nccs[k][-1] for k in range(K)])
            r_pose, r_params, r_nccs, r_times, r_alphas = (
                self.run_test_time_optimization(
                    gt_ms, _seed_poses(final_pose, restart_idx), scales, imagesim_cfg
                )
            )
            best_s, new_ncc = _select(r_nccs)
            iters_run += max(len(r_nccs[j]) - 1 for j in range(K * S))
            improved = new_ncc > prev_ncc
            if improved.any():
                mats = np.asarray(final_pose.matrix).reshape(K, 4, 4).copy()
                r_mats = np.asarray(r_pose.matrix).reshape(K * S, 4, 4)
                sel = np.arange(K) * S + best_s
                mats[improved] = r_mats[sel[improved]]
                final_pose = RigidTransform(jnp.asarray(mats))
                for k in np.flatnonzero(improved):
                    # extend with the WINNING seed's rows. Row 0 of each list
                    # is that start's initial state: when the unperturbed
                    # seed wins it duplicates the trajectory's current tail —
                    # drop it; when a jittered seed wins, keep it so the
                    # recorded trajectory (and animate) shows the hop the
                    # optimizer actually took.
                    j = int(k * S + best_s[k])
                    skip = 1 if best_s[k] == 0 else 0
                    params[k].extend(r_params[j][skip:])
                    nccs[k].extend(r_nccs[j][skip:])
                    times[k].extend(r_times[j][skip:])
                    alphas[k].extend(r_alphas[j][skip:])
            if self.verbose > 0:
                print(
                    f"Restart pass {restart_idx + 1}: improved "
                    f"{int(improved.sum())}/{K} images",
                    flush=True,
                )
            # stop re-annealing once a pass moves no image's objective by
            # more than the scheduler's own progress threshold (ADDITIVE:
            # NCC is bounded in [-1, 1] and can be <= 0, where a relative
            # margin would invert the test)
            if not (new_ncc > prev_ncc + self.threshold).any():
                break
        runtime = time.perf_counter() - t0
        results = []
        for k in range(K):
            trajectory = dict(
                params=np.asarray(params[k], dtype=np.float64),
                ncc=np.asarray(nccs[k], dtype=np.float64),
                times=np.asarray(times[k], dtype=np.float64),
                lrs=np.asarray(alphas[k], dtype=np.float64),
            )
            kwargs = dict(
                pf_to_af=pf_to_afs[k], runtime=runtime, trajectory=trajectory,
                # iterations actually EXECUTED across all passes (a discarded
                # re-anneal pass costs wall time but leaves no trajectory
                # rows; per-iteration figures must divide by this, not by
                # len(trajectory))
                iters_run=iters_run,
            )
            if K > 1:
                kwargs["batch_size"] = K  # wall time is shared by the batch
            results.append(
                (gt[k : k + 1], intrinsics, self.projector,
                 init_pose[k : k + 1], final_pose[k : k + 1], kwargs)
            )
        return results[:n_files]

    # ------------------------------------------------------------------
    def register_files(
        self,
        i2ds,
        outpath,
        mncc_patch_size: int = 9,
        gncc_patch_size: int = 11,
        sigma: float = 0.0,
        beta: float = 0.5,
        max_batch: int = 8,
    ):
        """Register many X-rays, batching runs that share intrinsics.

        Files are grouped by (shape, sdd, pixel spacing, detector origin)
        from their DICOM headers; each group runs through
        :meth:`run_batch` in ``max_batch``-sized chunks, one result bundle
        per X-ray (identical layout to :meth:`__call__`). Returns the list
        of bundle directories in input order.
        """
        from ..io.xray import dicom_group_key

        i2ds = [Path(p) for p in i2ds]
        groups: dict[tuple, list[Path]] = {}
        for p in i2ds:
            groups.setdefault(dicom_group_key(p), []).append(p)

        saved = {}
        for files in groups.values():
            for c0 in range(0, len(files), max_batch):
                chunk = files[c0 : c0 + max_batch]
                results = self.run_batch(
                    chunk, mncc_patch_size, gncc_patch_size, sigma, beta
                )
                for i2d, result in zip(chunk, results):
                    saved[i2d] = self._save_result(i2d, outpath, result)
        return [saved[p] for p in i2ds]

    # ------------------------------------------------------------------
    def __call__(
        self,
        i2d,
        outpath,
        mncc_patch_size: int = 9,
        gncc_patch_size: int = 11,
        sigma: float = 0.0,
        beta: float = 0.5,
    ):
        result = self.run(i2d, mncc_patch_size, gncc_patch_size, sigma, beta)
        return self._save_result(Path(i2d), outpath, result)

    # ------------------------------------------------------------------
    def _save_result(self, i2d, outpath, result):
        savepath = Path(outpath) / Path(i2d).stem
        savepath.mkdir(parents=True, exist_ok=True)
        gt, intrinsics, proj, init_pose, final_pose, kwargs = result

        init_img = final_img = None
        if self.saveimg:
            scaled = proj.rescale_detector(max(intrinsics["height"] // 256, 1))
            init_img = np.asarray(scaled(init_pose))
            if final_pose is not None:
                final_img = np.asarray(scaled(final_pose))

        self.save(savepath, gt, init_img, final_img, i2d, intrinsics, init_pose, final_pose, kwargs)
        return savepath

    # ------------------------------------------------------------------
    def save(self, savepath, gt, init_img, final_img, i2d, intrinsics, init_pose, final_pose, kwargs):
        """Persist the self-describing result bundle (base.py:329-399):
        ``parameters.npz`` (poses + trajectory), ``parameters.json`` (full
        config), ``trajectory.csv``, optional PNG renders."""
        savepath = Path(savepath)
        mask = str(Path(self.mask).resolve()) if self.mask is not None else None
        meta = {
            "drr": {
                "volume": str(Path(self.volume).resolve()),
                "mask": mask,
                "labels": self.labels,
                "orientation": self.orientation,
                **{k: float(v) if isinstance(v, (int, float)) else v for k, v in intrinsics.items()},
                "reverse_x_axis": self.reverse_x_axis,
                "renderer": self.renderer,
                "read_kwargs": self.read_kwargs,
                "drr_kwargs": self.drr_kwargs,
            },
            "xray": {
                "filename": str(Path(i2d).resolve()),
                "crop": self.crop,
                "subtract_background": self.subtract_background,
                "linearize": self.linearize,
                "reducefn": self.reducefn if not callable(self.reducefn) else "custom",
            },
            "optimization": {
                "equalize": self.equalize,
                "init_only": self.init_only,
                "scales": self.scales,
                "n_itrs": self.n_itrs,
                "parameterization": self.parameterization,
                "convention": self.convention,
                "lr_rot": self.lr_rot,
                "lr_xyz": self.lr_xyz,
                "patience": self.patience,
                "max_n_plateaus": self.max_n_plateaus,
                "max_restarts": self.max_restarts,
                "restart_seeds": self.restart_seeds,
                "restart_jitter_rot": self.restart_jitter_rot,
                "restart_jitter_xyz": self.restart_jitter_xyz,
                "coarse_seeds": self.coarse_seeds,
                "coarse_jitter_rot": self.coarse_jitter_rot,
                "coarse_jitter_xyz": self.coarse_jitter_xyz,
            },
            **{k: v for k, v in self.save_kwargs.items()},
            "pf_to_af": bool(kwargs.get("pf_to_af", False)),
        }
        if "runtime" in kwargs:
            meta["runtime"] = float(kwargs["runtime"])
        if "iters_run" in kwargs:
            meta["iters_run"] = int(kwargs["iters_run"])
        if "batch_size" in kwargs:
            # the wall-clock runtime above was shared by a whole batched run
            meta["batch_size"] = int(kwargs["batch_size"])

        arrays = {"init_pose": np.asarray(init_pose.matrix)}
        if final_pose is not None:
            arrays["final_pose"] = np.asarray(final_pose.matrix)
        traj = kwargs.get("trajectory")
        if traj is not None:
            arrays.update({f"trajectory_{k}": v for k, v in traj.items()})
            self._write_csv(savepath / "trajectory.csv", traj)
        np.savez(savepath / "parameters.npz", **arrays)
        (savepath / "parameters.json").write_text(json.dumps(meta, indent=2, default=str))

        if self.saveimg:
            self._save_png(savepath / "gt.png", np.asarray(gt))
            if init_img is not None:
                self._save_png(savepath / "init_img.png", init_img)
            if final_img is not None:
                self._save_png(savepath / "final_img.png", final_img)

    @staticmethod
    def _write_csv(path, traj):
        cols = ["r1", "r2", "r3", "tx", "ty", "tz", "ncc", "times", "lr_rot", "lr_xyz"]
        params = traj["params"]
        ncc = traj["ncc"][: len(params)]
        times = traj["times"][: len(params)]
        lrs = traj["lrs"][: len(params)]
        with open(path, "w") as f:
            f.write(",".join(cols) + "\n")
            for i in range(len(params)):
                row = list(params[i]) + [ncc[i] if i < len(ncc) else np.nan, times[i]] + list(lrs[i])
                f.write(",".join(f"{v:.8g}" for v in row) + "\n")

    @staticmethod
    def _save_png(path, img):
        img = np.asarray(img, dtype=np.float64).squeeze()
        if img.ndim == 3:
            img = img[0]
        lo, hi = img.min(), img.max()
        img8 = ((img - lo) / (hi - lo + 1e-12) * 255).astype(np.uint8)
        try:
            import imageio.v3 as iio

            iio.imwrite(path, img8)
        except ImportError:  # pragma: no cover
            np.save(str(path) + ".npy", img8)

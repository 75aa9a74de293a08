"""Pose-regression training engine.

TPU-first re-design of /root/reference/src/xvr/model/trainer.py:19-337. The
entire step — pose sampling, HU->density transfer with a random bone contrast,
DRR rendering, augmentation, CNN forward, composite loss, AGC-clipped Adam
update with gradient accumulation — is ONE jitted program; the host loop only
feeds PRNG keys (and, for multi-CT training, swaps the volume leaves of the
Projector pytree). Dynamic keep-filtering (trainer.py:200-205) is replaced by
loss masking so shapes stay static.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geometry import RigidTransform, make_translation
from ..io.volumes import read
from ..models import PoseRegressor, init_pose_regressor
from ..render.projector import Projector
from ..render.volume import Volume, transform_hu_to_density
from ..utils.itk import get_4x4
from ..utils.transforms import make_xray_transforms
from .augmentations import xray_augmentations
from .checkpoint import latest_checkpoint, load_checkpoint, restore_into, save_checkpoint
from .loss import pose_regression_loss
from .sampler import get_random_pose
from .schedule import identity_schedule, warmup_cosine_schedule

IMG_THRESHOLD = 0.10  # keep if >10% of pixels are nonzero (trainer.py:298)
MASK_THRESHOLD = 0.05  # keep if >5% of pixels hit masked structures (trainer.py:302)


def pad_volumes(volumes: list[Volume]) -> list[Volume]:
    """Zero-pad a list of volumes to a common static shape.

    Multi-CT training feeds different subjects through ONE compiled step;
    XLA needs a single static volume shape, so every subject is padded (with
    air, -1000 HU) to the elementwise max shape. World geometry is unchanged
    because the affine is kept and padding extends past the original extent.
    """
    shapes = np.array([v.data.shape for v in volumes])
    target = tuple(int(x) for x in shapes.max(axis=0))
    out = []
    for v in volumes:
        pads = [(0, t - s) for t, s in zip(target, v.data.shape)]
        data = jnp.pad(v.data, pads, constant_values=-1000.0)
        mask = jnp.pad(v.mask, pads) if v.mask is not None else None
        out.append(Volume(data=data, affine=v.affine, mask=mask, orientation=v.orientation))
    return out


class Trainer:
    """Train a PoseRegressor by rendering DRRs at random poses.

    Accepts the reference trainer's full argument surface
    (trainer.py:20-72); ``num_workers``/``pin_memory`` are accepted for CLI
    compatibility but unused (loading is synchronous NumPy — volumes live in
    device memory for the whole run).
    """

    def __init__(
        self,
        volpath,
        maskpath,
        outpath,
        alphamin, alphamax, betamin, betamax, gammamin, gammamax,
        txmin, txmax, tymin, tymax, tzmin, tzmax,
        sdd,
        height,
        delx,
        orientation="AP",
        reverse_x_axis=False,
        renderer="trilinear",
        parameterization="quaternion_adjugate",
        convention="ZXY",
        model_name="resnet18",
        pretrained=False,
        norm_layer="groupnorm",
        unit_conversion_factor=1000.0,
        p_augmentation=0.333,
        lr=2e-4,
        weight_ncc=1.0,
        weight_geo=1e-2,
        weight_dice=1.0,
        weight_mvc=0.0,
        batch_size=116,
        n_total_itrs=1_000_000,
        n_warmup_itrs=1_000,
        n_grad_accum_itrs=4,
        n_save_every_itrs=1_000,
        disable_scheduler=False,
        ckptpath=None,
        reuse_optimizer=False,
        warp=None,
        invert=False,
        patch_size=None,
        num_workers=4,
        pin_memory=False,
        weights=None,
        seed=0,
        mesh=None,
    ):
        cfg = dict(locals())
        cfg.pop("self")
        cfg.pop("mesh")  # a Mesh is runtime topology, not checkpointable config
        self.config = cfg
        self.mesh = mesh

        # "<family>_exact" pins the XLA golden renderer — the exact
        # piecewise-constant Siddon / tent trilinear models with autodiff
        # gradients (subgradients at voxel-boundary crossings, the same
        # semantics the reference gets from torch autograd through diffdrr,
        # reference config/trainer.py:9) — and opts out of every TPU kernel
        # upgrade. Orders of magnitude slower than the fast paths; the
        # packaged escape hatch when the quarter-voxel smoothing of
        # `siddon` must be ruled out.
        self.renderer_exact = renderer.endswith("_exact")
        renderer = renderer.removesuffix("_exact")

        self.outpath = Path(outpath)
        self.outpath.mkdir(parents=True, exist_ok=True)
        self.batch_size = int(batch_size)
        if mesh is not None and self.batch_size % mesh.size:
            # shard_map splits the pose batch exactly over every device; a
            # device-divisible batch also keeps GSPMD layouts pad-free
            rounded = -(-self.batch_size // mesh.size) * mesh.size
            print(
                f"multi-chip: batch_size {self.batch_size} -> {rounded} "
                f"(multiple of {mesh.size} devices)", flush=True,
            )
            self.batch_size = rounded
            cfg["batch_size"] = rounded
        self.n_total_itrs = int(n_total_itrs)
        self.n_grad_accum_itrs = int(n_grad_accum_itrs)
        self.n_save_every_itrs = int(n_save_every_itrs)
        self.sdd = float(sdd)
        self.p_augmentation = float(p_augmentation)
        self.pose_ranges = dict(
            alphamin=alphamin, alphamax=alphamax, betamin=betamin, betamax=betamax,
            gammamin=gammamin, gammamax=gammamax, txmin=txmin, txmax=txmax,
            tymin=tymin, tymax=tymax, tzmin=tzmin, tzmax=tzmax,
        )
        self.loss_weights = dict(
            weight_ncc=weight_ncc, weight_geo=weight_geo,
            weight_dice=weight_dice, weight_mvc=weight_mvc,
        )

        # ---- subjects ----
        self.subject_weights = weights
        self.patch_size = tuple(int(x) for x in patch_size) if patch_size is not None else None
        self.volumes, self.single_subject = self._initialize_subjects(
            volpath, maskpath, orientation
        )

        # ---- projector (detector static; volume leaves swap per subject) ----
        labels = None
        if self.volumes[0].mask is not None:
            present = set()
            for v in self.volumes:
                present |= set(int(x) for x in np.unique(np.asarray(v.mask)))
            labels = tuple(sorted(present - {0}))
        self.labels = labels
        self.projectors = [
            Projector.from_volume(
                v, sdd=sdd, height=height, delx=delx,
                reverse_x_axis=reverse_x_axis, renderer=renderer, labels=labels,
            )
            for v in self.volumes
        ]
        self.centers = [v.center for v in self.volumes]

        # TPU fast path: single-channel trilinear rendering upgrades to the
        # Pallas slab-marching kernel, with the march axis fixed from the mean
        # training pose (disable with XVR_NO_PALLAS=1). Wide alpha sweeps
        # (ljubljana r1 in [-45, 105], femur r1 in [75, 270] — spans no single
        # march axis can cover) are STRATIFIED: the alpha range is split into
        # K contiguous sub-ranges, each with its own permutation/window and a
        # static share of the batch proportional to its width, so the sampled
        # pose distribution stays uniform over the full range.
        import os as _os

        # Every stratum starts as the full range; _try_shearwarp_strata
        # replaces these on success. self.strata_* are consumed by _build_step.
        self.strata_ranges = [dict(self.pose_ranges)]
        self.strata_counts = (self.batch_size,)
        self.projectors = [(p,) for p in self.projectors]

        if (
            renderer in ("trilinear", "siddon")
            and not self.renderer_exact  # *_exact pins the XLA golden path
            and (
                jax.default_backend() == "tpu"
                # shear-warp is plain XLA; XVR_FORCE_SHEARWARP lets CPU tests
                # exercise the production fast path (same override as the
                # registrar's)
                or _os.environ.get("XVR_FORCE_SHEARWARP")
            )
            and not _os.environ.get("XVR_NO_PALLAS")
        ):
            from ..geometry import convert as _convert

            mean_rot = jnp.asarray(
                [[(alphamin + alphamax) / 2, (betamin + betamax) / 2,
                  (gammamin + gammamax) / 2]], jnp.float32
            )
            ref = _convert(mean_rot, jnp.zeros((1, 3)), "euler_angles", "ZXY", degrees=True)
            # Exact window sizing: measure the per-tile transverse span at the
            # CORNERS of the sampling ranges (rotation x translation extremes)
            # — the worst-case tiles live there, and an undersized window
            # silently clips ray contributions.
            probes = self._probe_corners(**self.pose_ranges)
            # The step is compiled ONCE for all subjects, so the kernel
            # layout/windows must be unified from worst-case measurements
            # across every subject.
            # shear-warp MXU renderer (forward + analytic adjoint backward;
            # per-channel masked volumes for labelmap rendering), stratifying
            # the alpha range if one permutation cannot cover the whole sweep.
            # Under a mesh the render runs inside shard_map over the flattened
            # device axes (the factorization is per-image, so batch sharding
            # is mechanical); strata shares are rounded to device multiples.
            upgraded_ok = False
            for edges in self._stratum_candidates():
                if self._try_shearwarp_strata(edges):
                    upgraded_ok = True
                    break
            if not upgraded_ok and renderer == "trilinear":
                self.projectors = [p[0] for p in self.projectors]
                # steep-ray / labelmap fallback: the slab-marching Pallas
                # kernel (its channel path covers masked training when the
                # shear-warp strata upgrade declined the geometry)
                upgraded = [
                    p.with_pallas(ref, probe_poses=probes, window=48)
                    for p in self.projectors
                ]
                perms = {p.pallas_perm for p in upgraded}
                if all(p.renderer == "trilinear_pallas" for p in upgraded) and len(perms) == 1:
                    w_det = max(
                        p.replace(pallas_remap=False).measure_window(probes)
                        for p in upgraded
                    )
                    w_remap = max(
                        p.replace(pallas_remap=True).measure_window(probes)
                        for p in upgraded
                    )
                    window, use_remap = (
                        (w_remap, True) if w_remap + 8 < w_det else (w_det, False)
                    )
                    self.projectors = [
                        p.replace(pallas_window=window, pallas_remap=use_remap)
                        for p in upgraded
                    ]
                    print(
                        f"Using Pallas trilinear kernel (measured window={window}, "
                        f"remap={use_remap})",
                        flush=True,
                    )
                elif len(perms) > 1:
                    print(
                        "Pallas disabled: subjects disagree on the march-axis "
                        f"permutation {sorted(perms)}", flush=True,
                    )
                self.projectors = [(p,) for p in self.projectors]
            if {p.renderer for tup in self.projectors for p in tup} <= {"trilinear", "siddon"}:
                print(
                    "WARNING: no TPU kernel upgrade applied — training will "
                    "run on the XLA golden renderer (orders of magnitude "
                    "slower). Check the pose ranges / march-axis messages "
                    "above.",
                    flush=True,
                )

        # ---- model ----
        import os as _os2

        compute_dtype = (
            "bfloat16"
            if (_os2.environ.get("XVR_BF16") and jax.default_backend() == "tpu")
            else "float32"
        )
        self.model = PoseRegressor(
            model_name=model_name,
            parameterization=parameterization,
            convention=convention,
            norm_layer=norm_layer,
            unit_conversion_factor=unit_conversion_factor,
            compute_dtype=compute_dtype,
        )
        key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(key)
        self.params = init_pose_regressor(self.model, init_key, int(height))
        if pretrained:
            from ..models.pretrained import load_imagenet_backbone

            self.params, loaded = load_imagenet_backbone(self.params, model_name)
            print(
                "Loaded ImageNet backbone weights"
                if loaded
                else "pretrained=True but no ImageNet weights found (set "
                "XVR_PRETRAINED_DIR or place a torchvision state_dict in the "
                "torch hub cache); training from random init",
                flush=True,
            )

        # ---- optimizer ----
        if disable_scheduler:
            schedule = identity_schedule(lr)
        else:
            schedule = warmup_cosine_schedule(
                lr, n_warmup_itrs / n_grad_accum_itrs, n_total_itrs / n_grad_accum_itrs
            )
        self.schedule = schedule
        inner = optax.chain(
            optax.adaptive_grad_clip(0.01, eps=1e-3),  # timm AGC (trainer.py:227)
            optax.adam(schedule),
        )
        self.tx = optax.MultiSteps(inner, every_k_schedule=int(n_grad_accum_itrs))
        self.opt_state = self.tx.init(self.params)

        # ---- checkpoint restore (xvr restart semantics) ----
        self.start_itr, self.model_number = 0, 0
        if ckptpath is not None:
            path = latest_checkpoint(ckptpath)
            if path is not None:
                ckpt = load_checkpoint(path)
                self.params = restore_into(self.params, ckpt["model_state_dict"])
                if reuse_optimizer:
                    self.opt_state = restore_into(
                        self.opt_state, ckpt["optimizer_state_dict"]
                    )
                    self.start_itr = int(ckpt["itr"])
                    self.model_number = int(ckpt["model_number"])

        # ---- template->patient reframe (trainer.py:145, utils/ants.py) ----
        self.reframe = None
        if warp is not None:
            self.reframe = get_4x4(warp, volpath, invert)

        self.transforms = make_xray_transforms(int(height))
        self._step = self._build_step()
        self._logfile = self.outpath / "train_log.jsonl"

    # ------------------------------------------------------------------
    @staticmethod
    def _probe_corners(
        alphamin, alphamax, betamin, betamax, gammamin, gammamax,
        txmin, txmax, tymin, tymax, tzmin, tzmax,
    ) -> RigidTransform:
        """Poses at the corners of the sampling ranges (rotation x translation
        extremes) — the worst-case kernel windows live there."""
        from ..geometry import convert as _convert

        rot_corners = [
            [a, b, g]
            for a in (alphamin, alphamax)
            for b in (betamin, betamax)
            for g in (gammamin, gammamax)
        ]
        t_corners = [
            [txmin, tymin, tzmin], [txmax, tymin, tzmax],
            [txmin, tymax, tzmax], [txmax, tymax, tzmin],
        ]
        rots = jnp.asarray([rc for rc in rot_corners for _ in t_corners], jnp.float32)
        xyzs = jnp.asarray(t_corners * len(rot_corners), jnp.float32)
        return _convert(rots, xyzs, "euler_angles", "ZXY", degrees=True)

    def _stratum_candidates(self) -> list[list[float]]:
        """Candidate alpha-edge sets for stratified rendering, best first.

        The march axes live at multiples of 90 degrees of the orbit, so the
        natural stratum boundaries are the MIDLINES between axes (45 + 90k):
        each axis-aligned stratum keeps every ray within ~45 degrees (plus
        the detector cone) of its march axis. Uniform K-splits follow as
        fallbacks for envelopes the axis-aligned split cannot cover (e.g.
        extreme beta ranges)."""
        import math

        r = self.pose_ranges
        amin, amax = float(r["alphamin"]), float(r["alphamax"])
        cands: list[list[float]] = [[amin, amax]]
        x = (math.floor((amin - 45.0) / 90.0) + 1) * 90.0 + 45.0
        cross = []
        while x < amax:
            if x > amin:
                cross.append(x)
            x += 90.0
        # drop slivers at the range ends (they would starve the batch share)
        cross = [c for c in cross if c - amin > 10.0 and amax - c > 10.0]
        if cross:
            cands.append([amin] + cross + [amax])
        for K in (2, 3, 4, 5, 6):
            cands.append([float(v) for v in np.linspace(amin, amax, K + 1)])
        return cands

    def _try_shearwarp_strata(self, edges) -> bool:
        """Split the alpha range at ``edges`` and upgrade every
        (stratum, subject) projector to the shear-warp MXU renderer.

        Succeeds only if every stratum passes the steepness gate with a
        single march-axis permutation shared across subjects (windows are
        unified to the per-stratum worst case). On success sets
        self.projectors (per subject: tuple of K stratum variants),
        self.strata_ranges, and self.strata_counts (batch shares proportional
        to stratum widths — the sampled alpha distribution stays exactly
        uniform over the full range).
        """
        from ..geometry import convert as _convert

        r = self.pose_ranges
        edges = np.asarray(edges, dtype=np.float64)
        K = len(edges) - 1
        flat = [p[0] if isinstance(p, tuple) else p for p in self.projectors]

        strata_projs: list[list[Projector]] = []  # [stratum][subject]
        strata_ranges = []
        for lo, hi in zip(edges[:-1], edges[1:]):
            sub = dict(r)
            sub["alphamin"], sub["alphamax"] = float(lo), float(hi)
            mean_rot = jnp.asarray(
                [[(lo + hi) / 2, (r["betamin"] + r["betamax"]) / 2,
                  (r["gammamin"] + r["gammamax"]) / 2]], jnp.float32
            )
            ref = _convert(mean_rot, jnp.zeros((1, 3)), "euler_angles", "ZXY", degrees=True)
            probes = self._probe_corners(**sub)
            upgraded = [p.with_shearwarp(ref, probe_poses=probes) for p in flat]
            perms = {p.pallas_perm for p in upgraded}
            if not all(p.renderer.endswith("_fast") for p in upgraded) or len(perms) != 1:
                return False
            # unify static layout across subjects — the step compiles once,
            # so the treedef must be shared. If subjects disagree on the warp
            # remap, fall back to the unsheared layout with re-measured
            # windows (window values are layout-specific).
            remaps = {p.shearwarp_remap for p in upgraded}
            if len(remaps) > 1:
                from ..render.shearwarp import measured_warp_window

                ws = []
                for p in upgraded:
                    src_p, tgt_p = p.rays_host(probes)
                    ws.append(measured_warp_window(
                        src_p, tgt_p, p.affine_inverse_host(), p.pallas_perm,
                        (p.detector.height, p.detector.width),
                        p.shearwarp_grid, remap=False,
                    ))
                warp_w = int(-(-max(ws) // 8) * 8)
                upgraded = [p.replace(shearwarp_remap=False) for p in upgraded]
            else:
                warp_w = max(p.shearwarp_window for p in upgraded)
            # per-label channel bounds: union across subjects
            bounds = None
            bset = {p.shearwarp_bounds for p in upgraded} - {None}
            if bset:
                C = len(next(iter(bset)))
                bounds = tuple(
                    (min(b[c][0] for b in bset), max(b[c][1] for b in bset))
                    for c in range(C)
                )
            strata_projs.append([
                p.replace(shearwarp_window=warp_w, shearwarp_bounds=bounds)
                for p in upgraded
            ])
            strata_ranges.append(sub)

        # batch shares proportional to widths (largest-remainder rounding) —
        # in units of the device count when a mesh shards the render, so
        # every stratum splits exactly over shard_map's flattened device axes
        unit = 1 if self.mesh is None else int(self.mesh.size)
        widths = np.diff(edges)
        units_total = self.batch_size // unit
        exact = widths / widths.sum() * units_total
        counts = np.floor(exact).astype(int)
        for i in np.argsort(exact - counts)[::-1][: units_total - counts.sum()]:
            counts[i] += 1
        if (counts <= 0).any():
            return False
        counts = counts * unit

        self.projectors = [
            tuple(strata_projs[k][s] for k in range(K)) for s in range(len(flat))
        ]
        self.strata_ranges = strata_ranges
        self.strata_counts = tuple(int(c) for c in counts)
        desc = ", ".join(
            f"[{sr['alphamin']:.0f},{sr['alphamax']:.0f}]x{c}(w{p[0].shearwarp_window})"
            for sr, c, p in zip(strata_ranges, self.strata_counts, zip(*self.projectors))
        )
        print(f"Using shear-warp MXU renderer, {K} alpha strata: {desc}", flush=True)
        return True

    # ------------------------------------------------------------------
    def _initialize_subjects(self, volpath, maskpath, orientation):
        volpath = Path(volpath)
        if volpath.is_file():
            return [read(volpath, maskpath, orientation=orientation)], True
        vols = sorted(p for p in volpath.glob("[!.]*.nii*"))
        if not vols:
            raise FileNotFoundError(f"No volumes found in {volpath}")
        masks = (
            sorted(Path(maskpath).glob("[!.]*.nii*")) if maskpath is not None else [None] * len(vols)
        )
        subjects = [read(v, m, orientation=orientation) for v, m in zip(vols, masks)]
        return pad_volumes(subjects), len(subjects) == 1

    # ------------------------------------------------------------------
    def _build_step(self):
        model = self.model
        strata_ranges = [
            {k: float(v) for k, v in r.items()} for r in self.strata_ranges
        ]
        counts = self.strata_counts
        batch_size = self.batch_size
        sdd = self.sdd
        weights = self.loss_weights
        p_aug = self.p_augmentation
        transforms = self.transforms
        use_reframe = self.reframe is not None
        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import (
                replicate_tree,
                shard_batch,
                shard_batch_flat,
                shard_rays,
            )

            mesh_axes = tuple(mesh.axis_names)
        else:
            shard_batch = shard_batch_flat = shard_rays = replicate_tree = None

        def _shard_pose(pose: RigidTransform) -> RigidTransform:
            if mesh is None:
                return pose
            return RigidTransform(shard_batch(mesh, pose.matrix))

        def _sharded_fast_render(proj):
            """Shear-warp render under the mesh: the factorization is
            per-image, so the pose batch shards over the FLATTENED device
            axes (dp x rays both act as data parallelism — ray sharding has
            no meaning for a whole-image slope-space pipeline) via shard_map;
            the Pallas warp cannot be auto-partitioned by GSPMD. Density and
            the prepared volume replicate; XLA lays the gradient psum on ICI."""

            def body(pose_mat, density, prepared):
                src, tgt = proj.rays(RigidTransform(pose_mat))
                return proj.render_rays(src, tgt, density=density, prepared=prepared)

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(mesh_axes), P(), P()),
                out_specs=P(mesh_axes),
                check_vma=False,  # custom_vjp inside the body
            )

        offsets = np.concatenate([[0], np.cumsum(counts)])

        def render_batch(projectors, pose, density, packed, prepared):
            """Render the pose batch stratum-by-stratum (static slices; each
            stratum has its own march-axis permutation/window) -> (B,C,H,W)."""
            imgs = []
            for k, proj in enumerate(projectors):
                pose_k = RigidTransform(
                    jax.lax.slice_in_dim(pose.matrix, int(offsets[k]), int(offsets[k + 1]))
                )
                if mesh is not None and proj.renderer.endswith(("_fast", "_shearwarp")):
                    raw = _sharded_fast_render(proj)(
                        pose_k.matrix, density, prepared[k]
                    )
                else:
                    src, tgt = proj.rays(pose_k)
                    if mesh is not None:
                        tgt = shard_rays(mesh, tgt)  # ray-parallel render over ICI
                    raw = proj.render_rays(
                        src, tgt, density=density, packed=packed[k], prepared=prepared[k]
                    )
                imgs.append(proj.reshape_transform(raw, int(counts[k])))
            return jnp.concatenate(imgs, axis=0) if len(imgs) > 1 else imgs[0]

        @partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
        def step(params, opt_state, key, projectors: tuple, center, reframe):
            keys = jax.random.split(key, 2 + len(counts))
            k_contrast, k_aug = keys[0], keys[1]

            # Sample poses per alpha stratum (shares proportional to widths
            # keep the marginal distribution uniform over the full range),
            # about the isocenter, then shift to the volume center
            pose = RigidTransform(jnp.concatenate([
                get_random_pose(keys[2 + k], batch_size=int(counts[k]), **strata_ranges[k]).matrix
                for k in range(len(counts))
            ], axis=0))
            pose = _shard_pose(pose.compose(make_translation(center)))

            # Random bone contrast (trainer.py:124,196)
            contrast = jax.random.uniform(k_contrast, (), minval=1.0, maxval=10.0)
            density = transform_hu_to_density(projectors[0].volume.data, contrast)
            # pack/permute once per step (per stratum: permutations differ);
            # reused by target render, pred render, and the custom-VJP backward
            packed, prepared = [], []
            for proj in projectors:
                ren = proj.renderer
                packed.append(
                    proj.pack_for_pallas(density) if ren == "trilinear_pallas" else None
                )
                prepared.append(
                    proj.prepare_for_shearwarp(density)
                    if ren.endswith(("_fast", "_shearwarp"))
                    else None
                )

            # Target DRRs (no gradient; trainer.py:199-205)
            raw = render_batch(projectors, pose, density, packed, prepared)
            raw = jax.lax.stop_gradient(raw)
            fg = (raw > 0).astype(raw.dtype)
            img = jnp.sum(raw, axis=1, keepdims=True)
            if raw.shape[1] > 1:
                hit = (jnp.sum(raw[:, 1:], axis=1, keepdims=True) > 0).astype(raw.dtype)
                keep = jnp.mean(hit, axis=(1, 2, 3)) > MASK_THRESHOLD
            else:
                keep = jnp.mean(fg, axis=(1, 2, 3)) > IMG_THRESHOLD
            keep = keep.astype(img.dtype)

            # Augment + normalize the network input. Under a mesh the CNN
            # batch shards over ALL axes flattened (per-image work: rays is
            # just more data parallelism for the regressor).
            x = transforms(xray_augmentations(k_aug, img, p=p_aug))
            if mesh is not None:
                x = shard_batch_flat(mesh, x)

            def loss_fn(params):
                rot, xyz = model.apply(params, x)
                pred_pose = model.decode(rot, xyz)
                if use_reframe:
                    pred_pose = pred_pose.compose(RigidTransform(reframe))
                # Differentiable re-render at the predicted poses. Each pred
                # pose uses its TARGET pose's stratum: predictions track their
                # targets once training moves, and out-of-stratum predictions
                # only blur (shear-warp has no correctness cliff), raising the
                # loss that pulls them back.
                praw = render_batch(projectors, pred_pose, density, packed, prepared)
                pfg = (praw > 0).astype(praw.dtype)
                pimg = jnp.sum(praw, axis=1, keepdims=True)
                loss, metrics = pose_regression_loss(
                    transforms(img), fg, pose,
                    transforms(pimg), pfg, pred_pose,
                    keep, sdd, **weights,
                )
                return loss, metrics

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if mesh is not None:
                # Pin the param-grad pytree replicated: the backward's psums
                # land directly on ICI instead of GSPMD inventing per-op
                # shardings for GroupNorm scale/bias grads (which forced an
                # involuntary full rematerialization re-layout per step).
                grads = replicate_tree(mesh, grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        return step

    # ------------------------------------------------------------------
    def _pick_subject(self, key) -> int:
        if len(self.projectors) == 1:
            return 0
        w = self.subject_weights
        if w is None:
            w = np.ones(len(self.projectors))
        w = np.asarray(w, dtype=np.float64)
        return int(np.random.default_rng(int(jax.random.bits(key))).choice(len(self.projectors), p=w / w.sum()))

    def _crop_patch(self, projectors: tuple, key):
        """Random fixed-size crop of the subject volume (torchio UniformSampler
        Queue semantics, /root/reference/src/xvr/model/utils.py:77-93): the
        crop keeps a static shape so it reuses the same compiled step; the
        affine is shifted so world geometry is preserved. The same crop is
        applied to every stratum variant of the projector."""
        ph, pw, pd = self.patch_size
        vol = projectors[0].volume
        nx, ny, nz = vol.data.shape
        rng = np.random.default_rng(int(jax.random.bits(key)))
        ox = int(rng.integers(0, max(nx - ph, 0) + 1))
        oy = int(rng.integers(0, max(ny - pw, 0) + 1))
        oz = int(rng.integers(0, max(nz - pd, 0) + 1))
        data = jax.lax.dynamic_slice(vol.data, (ox, oy, oz), (min(ph, nx), min(pw, ny), min(pd, nz)))
        mask = (
            jax.lax.dynamic_slice(vol.mask, (ox, oy, oz), data.shape)
            if vol.mask is not None else None
        )
        affine = vol.affine.at[:3, 3].add(vol.affine[:3, :3] @ jnp.asarray([ox, oy, oz], vol.affine.dtype))
        cropped = Volume(data=data, affine=affine, mask=mask, orientation=vol.orientation)
        out = tuple(p.replace(volume=cropped, density=data) for p in projectors)
        return out, cropped.center

    def step(self, itr: int):
        self.key, k_subj, k_patch, k_step = jax.random.split(self.key, 4)
        idx = self._pick_subject(k_subj)
        projectors, center = self.projectors[idx], self.centers[idx]
        if self.patch_size is not None:
            projectors, center = self._crop_patch(projectors, k_patch)
        reframe = (
            self.reframe.matrix if self.reframe is not None else jnp.eye(4)
        )
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state, k_step,
            projectors, center, reframe,
        )
        return metrics

    def train(self, run=None, log_every: int = 1, progress: bool = True):
        """Host training loop with checkpointing and logging
        (trainer.py:153-183 semantics; per-step exceptions are not swallowed —
        the jitted step is shape-static and cannot fail sporadically)."""
        from ..utils.profiling import maybe_trace_dir

        t0 = time.time()
        last = {}
        profile_dir = maybe_trace_dir()
        profiling = False
        for itr in range(self.start_itr, self.n_total_itrs):
            if itr % self.n_save_every_itrs == 0:
                self._checkpoint(itr)
            if profile_dir and itr == self.start_itr + 10 and not profiling:
                import jax as _jax

                _jax.profiler.start_trace(profile_dir)
                profiling = True
            if profiling and itr == self.start_itr + 15:
                import jax as _jax

                _jax.profiler.stop_trace()
                profiling = False
            metrics = self.step(itr)
            if run is not None and itr % 250 == 0:
                try:
                    self._log_figures(itr, run)
                except Exception as e:  # figure logging must never kill a run
                    print(f"figure logging failed at itr {itr}: {e}", flush=True)
            if itr % log_every == 0:
                last = {k: float(v) for k, v in jax.device_get(metrics).items()}
                last["itr"] = itr
                last["lr"] = float(self.schedule(itr // self.n_grad_accum_itrs))
                last["elapsed"] = time.time() - t0
                self._log(last, run)
                if progress and itr % 50 == 0:
                    msg = " ".join(
                        f"{k}={v:.4f}" for k, v in last.items() if k not in ("itr", "elapsed")
                    )
                    print(f"[{itr}/{self.n_total_itrs}] {msg}", flush=True)
        self._checkpoint(self.n_total_itrs)
        return last

    # ------------------------------------------------------------------
    def _log(self, metrics: dict, run=None):
        with open(self._logfile, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if run is not None:
            run.log(metrics)

    def _log_figures(self, itr: int, run, n: int = 4):
        """Render target/predicted DRR grids for experiment logging
        (reference cadence: every 250 itrs, trainer.py:306-316)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from ..visualization.viz2d import plot_drr

        self.key, k_pose = jax.random.split(self.key)
        ranges = self.strata_ranges[0]
        pose = get_random_pose(k_pose, batch_size=n, **ranges)
        proj = self.projectors[0][0].replace(renderer="trilinear")
        pose = pose.compose(make_translation(self.centers[0]))
        img = jnp.sum(proj(pose), axis=1, keepdims=True)
        x = self.transforms(img)
        rot, xyz = self.model.apply(self.params, x)
        pred_pose = self.model.decode(rot, xyz)
        if self.reframe is not None:
            pred_pose = pred_pose.compose(self.reframe)
        pred = jnp.sum(proj(pred_pose), axis=1, keepdims=True)
        imgs = np.asarray(jnp.concatenate([img, pred], axis=0))

        fig, axs = plt.subplots(ncols=n, nrows=2, figsize=(2 * n, 4))
        plot_drr(imgs, axs=axs.flatten(), ticks=False)
        plt.tight_layout()
        run.log({"itr": itr, "imgs": fig})
        plt.close(fig)

    def _checkpoint(self, itr: int):
        path = self.outpath / f"{self.model_number:04d}.ckpt"
        save_checkpoint(path, self.params, self.opt_state, itr, self.model_number, self.config)
        print(f"Saving checkpoint: {path}", flush=True)
        self.model_number += 1

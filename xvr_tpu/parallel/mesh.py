"""Device-mesh utilities: data-parallel + ray-parallel sharding.

The reference is single-GPU (SURVEY.md section 2c: bare ``.cuda()`` calls,
SLURM job arrays for scale-out). The TPU-native design scales within a pod
slice instead:

* **dp** — pose-batch data parallelism: every chip holds the full CT and
  renders/regresses a shard of the pose batch; only loss/grad reductions
  cross ICI (XLA inserts the psums from the sharding annotations).
* **rays** — ray parallelism inside a render (the analog of sequence/context
  parallelism): detector rows are sharded, so one render can exceed a single
  chip's FLOPs/HBM. Images are re-gathered automatically where the CNN needs
  them.

Annotation style: ``jit`` + ``NamedSharding`` constraints (GSPMD), not
hand-written collectives — the compiler lays communication on ICI.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, rays: int | None = None) -> Mesh:
    """A (dp, rays) mesh over the first ``n_devices`` devices.

    ``rays`` defaults to 2 when the device count allows, exercising both
    parallelism axes; pass ``rays=1`` for pure data parallelism.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else int(n_devices)
    devices = devices[:n]
    if rays is None:
        rays = 2 if n % 2 == 0 and n >= 4 else 1
    if n % rays:
        raise ValueError(f"n_devices={n} not divisible by rays={rays}")
    arr = np.asarray(devices).reshape(n // rays, rays)
    return Mesh(arr, ("dp", "rays"))


def shard_batch(mesh: Mesh, x):
    """Constrain a batch-leading array to be sharded over dp."""
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def shard_batch_flat(mesh: Mesh, x):
    """Constrain a batch-leading array over ALL mesh axes flattened.

    For per-image work with no intra-image sharding (the CNN forward/backward
    on rendered DRRs) every axis acts as data parallelism, so the batch splits
    over the whole mesh and parameter-gradient psums ride ICI once.
    """
    spec = P(tuple(mesh.axis_names), *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicate_tree(mesh: Mesh, tree):
    """Constrain every leaf of a pytree to be replicated over the mesh.

    Pinning the parameter-gradient pytree replicated gives GSPMD a consistent
    target for the CNN backward: without it the partitioner picks per-op
    shardings for GroupNorm scale/bias grads that force an involuntary full
    rematerialization (re-layout through HBM) every step.
    """
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda g: jax.lax.with_sharding_constraint(g, rep), tree)


def shard_rays(mesh: Mesh, x):
    """Constrain a (B, R, ...) ray tensor over (dp, rays)."""
    spec = P("dp", "rays", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def ray_sharded_fast_render(mesh: Mesh, projector, pose, density=None, prepared=None):
    """Split ONE shear-warp render's detector rows across the mesh.

    The slope-space accumulate is per-image (each device repeats it — cheap
    relative to the warp at large detectors); the detector warp, the
    tile-parallel part, is row-blocked over the ``rays`` axis with the pose
    batch over ``dp``. The slope grid is fitted to the FULL detector first
    (:func:`xvr_tpu.render.shearwarp.shearwarp_grid_bounds`), so every shard
    warps from the identical grid and the sharded output equals the
    unsharded fast render. This lifts the round-2 limitation where a single
    render bigger than one chip had to fall back to the XLA gather path.

    Differentiable: gradients flow to the pose through the custom shear-warp
    VJP inside ``shard_map`` (ray-block cotangents; replicated-operand
    cotangents are psummed by the transpose). Returns raw ``(B, R)`` line
    integrals like ``projector.render_rays``.

    Layout is picked from the batch size: when B divides ``dp`` the pose
    batch shards over ``dp`` and rows over ``rays`` (best: each device warps
    B/dp x H/rays rows); otherwise the batch is replicated and rows shard
    over EVERY mesh axis, so a single render (B=1) spans the whole mesh.
    Detector rows that don't divide the row-shard count are padded with
    duplicates of the last row (independent ray integrals; the pad is
    dropped before returning).
    """
    from ..render import shearwarp as sw

    if not projector.renderer.endswith(("_fast", "_shearwarp")):
        raise ValueError(f"fast renderer required, got {projector.renderer!r}")
    if projector.shearwarp_remap:
        # the barrel-shift warp layout derives per-column shifts from the
        # local ray block, which would disagree across shards (see
        # docs/performance.md "Ray sharding and the remap layout")
        raise ValueError("ray sharding requires shearwarp_remap=False")
    det = projector.detector
    H, W = det.height, det.width
    B = int(pose.matrix.shape[0])
    shape = dict(mesh.shape)
    dp = int(shape.get("dp", 1))
    if B % dp == 0:
        batch_axis, row_axes = "dp", ("rays",)
        n_row = int(shape.get("rays", 1))
    else:
        # small batch on a big mesh: replicate the batch, row-block over
        # every axis — each device repeats the cheap per-image accumulate
        # and warps a 1/mesh.size row slab
        batch_axis, row_axes = None, tuple(mesh.axis_names)
        n_row = mesh.size
    batch_spec = P(batch_axis)
    ray_spec = P(batch_axis, row_axes)
    density = projector.density if density is None else density
    if prepared is None:
        prepared = projector.prepare_for_shearwarp(density)
    if getattr(prepared, "ndim", 3) == 4:
        raise ValueError("ray sharding supports single-channel renders only")
    src, tgt = projector.rays(pose)
    grid_shape = projector.shearwarp_grid or sw.default_grid_shape((H, W))
    bounds = sw.shearwarp_grid_bounds(
        projector.affine_inverse, src, tgt,
        perm=projector.pallas_perm, grid_shape=grid_shape,
    )
    Hp = pad_to_multiple(H, n_row)
    if Hp != H:
        # duplicated last-row rays: inside the full-detector grid bounds by
        # construction, and their integrals are discarded below
        import jax.numpy as jnp

        tgt = jnp.concatenate(
            [tgt, jnp.tile(tgt[:, -W:, :], (1, Hp - H, 1))], axis=1
        )
    eps = 0.25 if projector.renderer.startswith("siddon") else 1.0
    affine_inverse = projector.affine_inverse

    def body(src_blk, tgt_blk, density, prepared, *bounds_blk):
        return sw.raymarch_trilinear_fast(
            density, affine_inverse, src_blk, tgt_blk,
            det_shape=(Hp // n_row, W), perm=projector.pallas_perm,
            prepared=prepared, grid_shape=grid_shape,
            warp_window=projector.shearwarp_window,
            eps=eps, grid_bounds=bounds_blk,
        )

    raw = jax.shard_map(
        body, mesh=mesh,
        in_specs=(batch_spec, ray_spec, P(), P()) + (batch_spec,) * 5,
        out_specs=ray_spec,
        check_vma=False,  # custom_vjp inside the body
    )(src, tgt, density, prepared, *bounds)
    return raw[:, : H * W] if Hp != H else raw


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)

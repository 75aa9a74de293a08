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


def pad_to_multiple(n: int, m: int) -> int:
    return int(math.ceil(n / m) * m)

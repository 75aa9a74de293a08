from .introspect import collective_bytes_summary
from .mesh import (
    make_mesh,
    ray_sharded_fast_render,
    replicate_tree,
    replicated,
    shard_batch,
    shard_batch_flat,
    shard_rays,
)

__all__ = [
    "collective_bytes_summary",
    "make_mesh",
    "ray_sharded_fast_render",
    "replicate_tree",
    "replicated",
    "shard_batch",
    "shard_batch_flat",
    "shard_rays",
]

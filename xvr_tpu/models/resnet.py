"""ResNet backbones (flax.linen) for pose regression.

TPU-native replacement for the timm backbone zoo consumed at
/root/reference/src/xvr/model/network.py:31-37 (``model_name`` "resnet18" by
default, "resnet34" in the paper's scripts, ``norm_layer="groupnorm"``,
``in_chans=1``, ``num_classes=0`` i.e. feature extraction only).

GroupNorm (32 groups, matching the timm default) is used instead of BatchNorm
so training is batch-statistics-free — this also makes the whole train step a
pure function of (params, batch), which is what lets it run as one jitted
program and shard cleanly with pjit/shard_map.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Callable


class BasicBlock(nn.Module):
    filters: int
    norm: ModuleDef
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), use_bias=False, dtype=self.dtype)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), use_bias=False, dtype=self.dtype)(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype
            )(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    filters: int
    norm: ModuleDef
    strides: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), use_bias=False, dtype=self.dtype)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.filters * 4, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype
            )(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-extracting ResNet; input NHWC, output (B, F) pooled features.

    ``compute_dtype="bfloat16"`` runs convs on the MXU in bf16 (params and
    normalization statistics stay float32).
    """

    stage_sizes: Sequence[int]
    block: type = BasicBlock
    num_filters: int = 64
    norm_layer: str = "groupnorm"
    num_groups: int = 32
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if self.norm_layer == "groupnorm":
            def make_norm():
                return _AdaptiveGroupNorm(self.num_groups)

        elif self.norm_layer == "layernorm":
            def make_norm():
                return nn.LayerNorm()

        else:
            raise ValueError(f"Unsupported norm_layer {self.norm_layer!r}")

        x = nn.Conv(
            self.num_filters, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=dtype,
        )(x)
        x = make_norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, block_size in enumerate(self.stage_sizes):
            for j in range(block_size):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(
                    filters=self.num_filters * 2**i, norm=make_norm,
                    strides=strides, dtype=dtype,
                )(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class _AdaptiveGroupNorm(nn.Module):
    """GroupNorm whose group count divides the channel count (timm behavior)."""

    num_groups: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        while c % g:
            g //= 2
        return nn.GroupNorm(num_groups=g)(x)


_CONFIGS = {
    "resnet18": dict(stage_sizes=[2, 2, 2, 2], block=BasicBlock),
    "resnet34": dict(stage_sizes=[3, 4, 6, 3], block=BasicBlock),
    "resnet50": dict(stage_sizes=[3, 4, 6, 3], block=BottleneckBlock),
    "resnet101": dict(stage_sizes=[3, 4, 23, 3], block=BottleneckBlock),
}


def create_backbone(
    model_name: str, norm_layer: str = "groupnorm", compute_dtype: str = "float32"
) -> ResNet:
    if model_name not in _CONFIGS:
        raise ValueError(
            f"Unknown model_name {model_name!r}; available: {sorted(_CONFIGS)}"
        )
    cfg = _CONFIGS[model_name]
    return ResNet(
        stage_sizes=cfg["stage_sizes"], block=cfg["block"],
        norm_layer=norm_layer, compute_dtype=compute_dtype,
    )

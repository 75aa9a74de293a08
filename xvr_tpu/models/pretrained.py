"""ImageNet backbone initialization from torchvision-format checkpoints.

The reference exposes ``--pretrained`` through timm
(/root/reference/src/xvr/model/network.py:31-37, default OFF at
config/trainer.py:16). This environment has no network access and no
torchvision, so weights are grafted from a torchvision-format ``state_dict``
file on disk (``weights_path`` argument, ``$XVR_PRETRAINED_DIR``, or the torch
hub cache). Conversion notes:

* conv kernels: torch OIHW -> flax HWIO;
* the stem conv collapses RGB -> 1 input channel by summing the RGB filters
  (timm's ``in_chans=1`` adaptation);
* BatchNorm running statistics are FOLDED into the affine
  (scale = w / sqrt(var + eps), bias = b - mean * scale) and used as the
  GroupNorm affine — an approximate but standard re-normalization init, since
  the reference trains with ``norm_layer="groupnorm"``;
* the pose heads stay randomly initialized.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import jax.numpy as jnp

_STAGES = {
    "resnet18": ([2, 2, 2, 2], "basic"),
    "resnet34": ([3, 4, 6, 3], "basic"),
    "resnet50": ([3, 4, 6, 3], "bottleneck"),
    "resnet101": ([3, 4, 23, 3], "bottleneck"),
}

_HUB_NAMES = {
    "resnet18": "resnet18-f37072fd.pth",
    "resnet34": "resnet34-b627a593.pth",
    "resnet50": "resnet50-0676ba61.pth",
    "resnet101": "resnet101-63fe2227.pth",
}


def find_imagenet_weights(model_name: str, weights_path=None) -> Path | None:
    """Locate a torchvision-format state_dict for ``model_name``."""
    candidates = []
    if weights_path is not None:
        candidates.append(Path(weights_path))
    env = os.environ.get("XVR_PRETRAINED_DIR")
    if env:
        candidates.append(Path(env) / f"{model_name}.pth")
        candidates.append(Path(env) / _HUB_NAMES.get(model_name, f"{model_name}.pth"))
    hub = Path.home() / ".cache" / "torch" / "hub" / "checkpoints"
    candidates.append(hub / _HUB_NAMES.get(model_name, f"{model_name}.pth"))
    for c in candidates:
        if c.is_file():
            return c
    return None


def _conv(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def _folded_affine(sd, prefix: str, eps: float = 1e-5):
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    rm = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    rv = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = w / np.sqrt(rv + eps)
    bias = b - rm * scale
    return jnp.asarray(scale), jnp.asarray(bias)


def _set_norm(block: dict, flax_name: str, sd, torch_prefix: str) -> None:
    scale, bias = _folded_affine(sd, torch_prefix)
    gn = block[flax_name]["GroupNorm_0"]
    gn["scale"] = scale.astype(gn["scale"].dtype)
    gn["bias"] = bias.astype(gn["bias"].dtype)


def load_imagenet_backbone(params, model_name: str, weights_path=None):
    """Graft ImageNet weights into PoseRegressor ``params`` (in a copy).

    -> (params, loaded: bool). When no weights file is found, returns the
    params unchanged with ``loaded=False`` (callers should warn and proceed
    from random init, matching the reference default of pretrained=False).
    """
    if model_name not in _STAGES:
        return params, False
    path = find_imagenet_weights(model_name, weights_path)
    if path is None:
        return params, False

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params = _deep_copy(params)
    net = params["params"]["ResNet_0"]

    # stem: RGB filters summed to the single X-ray channel
    stem = np.asarray(sd["conv1.weight"], np.float32).sum(axis=1, keepdims=True)
    net["Conv_0"]["kernel"] = jnp.asarray(stem.transpose(2, 3, 1, 0)).astype(
        net["Conv_0"]["kernel"].dtype
    )
    _set_norm(net, "_AdaptiveGroupNorm_0", sd, "bn1")

    stages, kind = _STAGES[model_name]
    block_name = "BasicBlock" if kind == "basic" else "BottleneckBlock"
    n_convs = 2 if kind == "basic" else 3
    k = 0
    for i, size in enumerate(stages):
        for j in range(size):
            blk = net[f"{block_name}_{k}"]
            tp = f"layer{i + 1}.{j}"
            for c in range(n_convs):
                blk[f"Conv_{c}"]["kernel"] = _conv(sd[f"{tp}.conv{c + 1}.weight"]).astype(
                    blk[f"Conv_{c}"]["kernel"].dtype
                )
                _set_norm(blk, f"_AdaptiveGroupNorm_{c}", sd, f"{tp}.bn{c + 1}")
            if f"Conv_{n_convs}" in blk:
                blk[f"Conv_{n_convs}"]["kernel"] = _conv(
                    sd[f"{tp}.downsample.0.weight"]
                ).astype(blk[f"Conv_{n_convs}"]["kernel"].dtype)
                _set_norm(blk, f"_AdaptiveGroupNorm_{n_convs}", sd, f"{tp}.downsample.1")
            k += 1
    return params, True


def _deep_copy(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy(v) for k, v in tree.items()}
    return tree

"""PoseRegressor: CNN backbone + dual pose heads.

Semantics of /root/reference/src/xvr/model/network.py:7-77: a feature
backbone followed by two linear heads — one emitting
``N_ANGULAR_COMPONENTS[parameterization]`` rotation parameters, one emitting a
3-vector translation scaled by ``unit_conversion_factor`` (1000 = the network
regresses metres, poses are millimetres); the outputs are decoded to a
:class:`RigidTransform` via :func:`xvr_tpu.geometry.convert`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry import N_ANGULAR_COMPONENTS, RigidTransform, convert
from .resnet import create_backbone


class PoseRegressor(nn.Module):
    model_name: str = "resnet18"
    parameterization: str = "quaternion_adjugate"
    convention: str | None = "ZXY"
    norm_layer: str = "groupnorm"
    unit_conversion_factor: float = 1000.0
    compute_dtype: str = "float32"  # "bfloat16" -> MXU mixed precision

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, 1, H, W) [NCHW, matching the rendering pipeline] -> (rot, xyz)."""
        n_rot = N_ANGULAR_COMPONENTS[self.parameterization]
        feats = create_backbone(self.model_name, self.norm_layer, self.compute_dtype)(
            jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC for conv efficiency
        )
        rot = nn.Dense(n_rot)(feats)
        xyz = self.unit_conversion_factor * nn.Dense(3)(feats)
        return rot, xyz

    def decode(self, rot: jnp.ndarray, xyz: jnp.ndarray) -> RigidTransform:
        return convert(
            rot, xyz, parameterization=self.parameterization, convention=self.convention
        )

    def predict_pose(self, params, x: jnp.ndarray) -> RigidTransform:
        rot, xyz = self.apply(params, x)
        return self.decode(rot, xyz)


def init_pose_regressor(
    model: PoseRegressor, key: jax.Array, height: int, width: int | None = None
):
    """Initialize parameters with a dummy (1, 1, H, W) input."""
    width = height if width is None else width
    dummy = jnp.zeros((1, 1, height, width), dtype=jnp.float32)
    return model.init(key, dummy)


def load_model(ckptpath, meta: bool = False):
    """Rebuild a PoseRegressor exactly from a self-describing checkpoint.

    Semantics of /root/reference/src/xvr/model/network.py:57-77:
    the checkpoint's embedded config fully determines the architecture.
    """
    from ..train.checkpoint import latest_checkpoint, load_checkpoint, restore_into

    path = latest_checkpoint(ckptpath) or ckptpath
    ckpt = load_checkpoint(path)
    config = ckpt["config"]
    model = PoseRegressor(
        model_name=config["model_name"],
        parameterization=config["parameterization"],
        convention=config.get("convention"),
        norm_layer=config.get("norm_layer", "groupnorm"),
        unit_conversion_factor=float(config.get("unit_conversion_factor", 1.0)),
    )
    template = init_pose_regressor(model, jax.random.PRNGKey(0), int(config["height"]))
    params = restore_into(template, ckpt["model_state_dict"])
    if meta:
        return model, params, config, ckpt.get("date")
    return model, params, config

"""Inference helpers: intrinsics-matched resampling and pose prediction.

Semantics of /root/reference/src/xvr/model/inference.py:9-55 and the
``diffdrr.utils.resample`` boundary: a real X-ray acquired at (sdd, delx, x0,
y0) is reprojected to the intrinsics the CNN was trained at, center-cropped
square, normalized, and passed through the network; the predicted pose can be
warp-corrected into the patient frame, and an "antipodal" pose constructed to
resolve the AP/PA flip ambiguity of foundation models.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import RigidTransform, convert
from ..utils.itk import get_4x4
from ..utils.transforms import center_crop, make_xray_transforms


def resample(
    img: jnp.ndarray,
    sdd: float,
    delx: float,
    x0: float,
    y0: float,
    new_sdd: float,
    new_delx: float,
    new_x0: float = 0.0,
    new_y0: float = 0.0,
) -> jnp.ndarray:
    """Reproject an X-ray (B, C, H, W) to different detector intrinsics.

    A detector pixel at physical offset u subtends ray angle atan(u / sdd);
    matching angles between detectors gives the (linear) correspondence
    ``u_old = u_new * sdd / new_sdd``. Bilinear resampling at those
    correspondences reproduces ``diffdrr.utils.resample`` as used by
    ``_resample_xray`` (model/inference.py:26-40).
    """
    B, C, H, W = img.shape
    scale = (new_delx / delx) * (sdd / new_sdd)

    i = jnp.arange(H, dtype=img.dtype)
    j = jnp.arange(W, dtype=img.dtype)
    # physical offsets on the NEW detector (centered, principal point shifted)
    v_new = (i - (H - 1) / 2.0) * new_delx + new_y0
    u_new = (j - (W - 1) / 2.0) * new_delx + new_x0
    # matching offsets on the OLD detector
    v_old = v_new * (sdd / new_sdd) + y0
    u_old = u_new * (sdd / new_sdd) + x0
    # back to pixel indices
    ii = v_old / delx + (H - 1) / 2.0
    jj = u_old / delx + (W - 1) / 2.0

    ii0 = jnp.clip(jnp.floor(ii), 0, H - 1)
    jj0 = jnp.clip(jnp.floor(jj), 0, W - 1)
    fi = jnp.clip(ii - ii0, 0.0, 1.0)
    fj = jnp.clip(jj - jj0, 0.0, 1.0)
    i0 = ii0.astype(jnp.int32)
    j0 = jj0.astype(jnp.int32)
    i1 = jnp.clip(i0 + 1, 0, H - 1)
    j1 = jnp.clip(j0 + 1, 0, W - 1)

    def gather(ia, ja):
        return img[:, :, ia][:, :, :, ja]

    out = (
        gather(i0, j0) * ((1 - fi)[:, None] * (1 - fj)[None, :])
        + gather(i0, j1) * ((1 - fi)[:, None] * fj[None, :])
        + gather(i1, j0) * (fi[:, None] * (1 - fj)[None, :])
        + gather(i1, j1) * (fi[:, None] * fj[None, :])
    )
    # zero out samples that fell outside the original detector
    valid = ((ii >= 0) & (ii <= H - 1))[:, None] & ((jj >= 0) & (jj <= W - 1))[None, :]
    return jnp.where(valid[None, None], out, 0.0)


def _resample_xray(img, sdd, delx, dely, x0, y0, config):
    """Match the model's assumed intrinsics (model/inference.py:26-40)."""
    if abs(delx - dely) > 1e-9:
        raise ValueError("Non-square pixels are not yet supported")
    model_height = int(config["height"])
    model_delx = float(config["delx"])
    H, W = img.shape[-2:]
    subsample = min(H, W) / model_height
    new_delx = model_delx / subsample
    img = resample(jnp.asarray(img), sdd, delx, x0, y0, float(config["sdd"]), new_delx, 0.0, 0.0)
    return img, H, W


def predict_pose(model, params, config, img, sdd, delx, dely, x0, y0):
    """-> (init_pose, preprocessed img) (model/inference.py:9-23)."""
    img, height, width = _resample_xray(img, sdd, delx, dely, x0, y0, config)
    side = min(height, width)
    img = center_crop(img, side, side)
    transforms = make_xray_transforms(int(config["height"]))
    x = transforms(img)
    rot, xyz = model.apply(params, x)
    return model.decode(rot, xyz), x


def correct_pose(pose: RigidTransform, warp, volume, invert: bool) -> RigidTransform:
    """Warp the predicted pose from the template into the patient frame
    (model/inference.py:43-49)."""
    if warp is None:
        return pose
    T = get_4x4(warp, volume, invert)
    return pose.compose(T)


def construct_antipode(pose: RigidTransform) -> RigidTransform:
    """The pose viewing from the opposite side (PA/AP ambiguity;
    model/inference.py:52-55): negate alpha/beta and add 180 deg to alpha."""
    rot, xyz = pose.convert("euler_angles", "ZXY")
    rot = rot.at[..., 0:2].multiply(-1.0)
    rot = rot.at[..., 0].add(jnp.pi)
    return convert(rot, xyz, parameterization="euler_angles", convention="ZXY")

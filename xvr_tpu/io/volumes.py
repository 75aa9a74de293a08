"""Volume loading: NIfTI -> :class:`xvr_tpu.render.Volume`.

Replaces the ``diffdrr.data.read(volpath, maskpath, labels, orientation)``
boundary (/root/reference/src/xvr/renderer/load.py:26,
model/utils.py:40).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..render.volume import Volume
from .nifti import load_nifti, to_canonical


def read(
    volpath: str | Path,
    maskpath: str | Path | None = None,
    labels=None,
    orientation: str | None = "AP",
    canonical: bool = True,
) -> Volume:
    """Load a CT/MR volume (+ optional labelmap) as a Volume pytree.

    ``labels``: if given (list of ints or "1,2,3" string), the labelmap is
    restricted to those labels (others -> 0), mirroring the reference's
    ``--labels`` flag (renderer/load.py:24-26).
    """
    data, affine = load_nifti(volpath)
    if canonical:
        data, affine = to_canonical(data, affine)

    mask = None
    if maskpath is not None:
        mdata, maffine = load_nifti(maskpath)
        if canonical:
            mdata, maffine = to_canonical(mdata, maffine)
        if mdata.shape != data.shape:
            raise ValueError(
                f"mask shape {mdata.shape} does not match volume shape {data.shape}"
            )
        mdata = np.rint(mdata).astype(np.int32)
        if labels is not None:
            labels = parse_labels(labels)
            keep = np.isin(mdata, labels)
            mdata = np.where(keep, mdata, 0)
            # "Labels in mask to exclusively render" (reference
            # cli/commands/register.py:72): structures outside the requested
            # labels become air, so they contribute nothing to the DRR after
            # the HU->density transfer (air maps to zero density).
            data = np.where(keep, data, -1000.0).astype(np.float32)
        mask = jnp.asarray(mdata)

    return Volume(
        data=jnp.asarray(data),
        affine=jnp.asarray(affine, dtype=jnp.float32),
        mask=mask,
        orientation=orientation,
    )


def parse_labels(labels) -> list[int]:
    if labels is None:
        return []
    if isinstance(labels, str):
        return [int(x) for x in labels.split(",") if x.strip()]
    return [int(x) for x in labels]

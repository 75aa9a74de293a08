"""Self-describing checkpoints (msgpack, single file).

Mirrors the reference checkpoint contract
(/root/reference/src/xvr/model/trainer.py:318-332 and network.py:57-77): each
file carries model weights, optimizer/schedule state, the iteration counter, a
monotonically increasing model number, a date stamp, and the **full resolved
config**, so a checkpoint alone suffices to rebuild the model and renderer
exactly (used by ``xvr restart`` and ``xvr register model``).
"""

from __future__ import annotations

import datetime
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, Path):
        return str(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def save_checkpoint(path, params, opt_state, itr: int, model_number: int, config: dict):
    payload = {
        "model_state_dict": serialization.to_state_dict(jax.device_get(params)),
        "optimizer_state_dict": serialization.to_state_dict(jax.device_get(opt_state)),
        "itr": int(itr),
        "model_number": int(model_number),
        "date": datetime.datetime.now().isoformat(),
        "config": _jsonable(config),
    }
    data = serialization.msgpack_serialize(payload)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


def load_checkpoint(path) -> dict:
    return serialization.msgpack_restore(Path(path).read_bytes())


def restore_into(template, state_dict):
    """Rebuild a pytree with the template's structure from a raw state dict."""
    return serialization.from_state_dict(template, state_dict)


def latest_checkpoint(dirpath) -> Path | None:
    """Pick the newest checkpoint file in a directory (semantics of
    --ckptpath accepting a directory, cli/commands/train.py:390-394)."""
    dirpath = Path(dirpath)
    if dirpath.is_file():
        return dirpath
    candidates = sorted(dirpath.glob("*.ckpt")) + sorted(dirpath.glob("*.pth"))
    if not candidates:
        return None
    return max(candidates, key=lambda p: p.stat().st_mtime)

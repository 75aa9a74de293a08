"""Experiment logging: wandb when available, local JSONL otherwise.

The reference hard-requires wandb (+WANDB_API_KEY,
/root/reference/src/xvr/cli/commands/train.py:467-474); here wandb is
optional so training runs on air-gapped TPU hosts.
"""

from __future__ import annotations

import json
import os
from pathlib import Path


class LocalRun:
    """wandb.Run-compatible shim writing JSONL to the project directory."""

    def __init__(self, project: str, name: str, config: dict, id: str | None = None):
        self.project = project
        self.name = name
        self.id = id or name
        root = Path(os.environ.get("XVR_LOG_DIR", "runs")) / project
        root.mkdir(parents=True, exist_ok=True)
        self._path = root / f"{self.name}.jsonl"
        with open(self._path, "a") as f:
            f.write(json.dumps({"event": "start", "config": _jsonable(config)}) + "\n")

    def log(self, metrics: dict):
        metrics = dict(metrics)
        fig = metrics.pop("imgs", None)
        if fig is not None:
            # matplotlib figure -> PNG next to the JSONL (wandb renders these
            # natively; the local shim persists them to disk)
            figdir = self._path.with_suffix("") / "figures"
            figdir.mkdir(parents=True, exist_ok=True)
            n = metrics.get("itr", len(list(figdir.glob("*.png"))))
            out = figdir / f"{int(n):07d}.png"
            try:
                fig.savefig(out, dpi=120)
                metrics["imgs"] = str(out)
            except Exception:
                pass
        with open(self._path, "a") as f:
            f.write(json.dumps(_jsonable(metrics), default=str) + "\n")

    def finish(self):
        pass


def _jsonable(d):
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            out[k] = str(v)
    return out


def start_run(project: str, name: str, config: dict, id: str | None = None):
    """wandb run if configured, else a local JSONL run."""
    if os.environ.get("WANDB_API_KEY"):
        try:
            import wandb

            wandb.login(key=os.environ["WANDB_API_KEY"])
            return wandb.init(
                project=project,
                name=name,
                config=config,
                id=id,
                resume="must" if id is not None else None,
            )
        except ImportError:
            pass
    return LocalRun(project, name, config, id)

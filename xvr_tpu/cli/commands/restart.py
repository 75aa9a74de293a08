"""`xvr restart` — resume training from a checkpoint
(/root/reference/src/xvr/cli/commands/restart.py:26-60: the checkpoint's
embedded config is rehydrated and the optimizer state reused)."""

from __future__ import annotations

import click

from ..formatter import CategorizedCommand, categorized_option
from ..logging import start_run


@click.command(cls=CategorizedCommand)
@categorized_option("-c", "--ckptpath", required=True, type=click.Path(exists=True),
                    help="Checkpoint of a pretrained pose regressor")
@categorized_option("--id", default=None, type=str, help="Run ID")
@categorized_option("--project", type=str, default=None, help="Project name")
def restart(ckptpath: str, id: str, project: str):
    """Restart model training from a checkpoint."""
    from ...train import Trainer
    from ...train.checkpoint import latest_checkpoint, load_checkpoint

    ckptpath = str(latest_checkpoint(ckptpath))
    config = dict(load_checkpoint(ckptpath)["config"])
    config["ckptpath"] = ckptpath
    config["reuse_optimizer"] = True
    config.pop("seed", None)

    # same multi-chip default as `xvr train`
    import jax

    mesh = None
    if len(jax.devices()) > 1:
        from ...parallel.mesh import make_mesh

        mesh = make_mesh()

    project = project or "xvr"
    run = start_run(project=project, name=project, config=config, id=id)
    trainer = Trainer(**config, mesh=mesh)
    trainer.train(run)

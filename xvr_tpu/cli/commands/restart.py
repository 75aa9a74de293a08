"""`xvr restart` — resume training from a checkpoint
(/root/reference/src/xvr/cli/commands/restart.py:26-60: the checkpoint's
embedded config is rehydrated and the optimizer state reused)."""

from __future__ import annotations

import click

from ..formatter import CategorizedCommand, categorized_option
from ..logging import start_run


@click.command(cls=CategorizedCommand)
@categorized_option("-c", "--ckptpath", required=True, type=click.Path(exists=True),
                    help="Checkpoint (or directory of them) to resume training from")
@categorized_option("--id", default=None, type=str,
                    help="Stable run identifier, letting the restart append to the same log")
@categorized_option("--project", type=str, default=None,
                    help="Experiment-log project to file this run under")
@categorized_option("--n_devices", default=None, type=int,
                    help="Chips to train on (default: all visible devices)", category="TPU")
@categorized_option("--mesh_rays", default=None, type=int,
                    help="Ray-parallel mesh axis size (default: auto; 1 = pure data parallel)",
                    category="TPU")
def restart(ckptpath: str, id: str, project: str, n_devices, mesh_rays):
    """Resume training exactly where a checkpoint left off."""
    from ...train import Trainer
    from ...train.checkpoint import latest_checkpoint, load_checkpoint

    ckptpath = str(latest_checkpoint(ckptpath))
    config = dict(load_checkpoint(ckptpath)["config"])
    config["ckptpath"] = ckptpath
    config["reuse_optimizer"] = True
    config.pop("seed", None)

    # same multi-chip default as `xvr train`, with the same overrides — a
    # restart on a host with a different device count should be explicit,
    # not silent (the mesh changes the sharding layout)
    import jax

    mesh = None
    n_dev = n_devices if n_devices is not None else len(jax.devices())
    if n_dev > 1:
        from ...parallel.mesh import make_mesh

        mesh = make_mesh(n_dev, rays=mesh_rays)
        print(
            f"Resuming on {n_dev} devices, mesh "
            f"{dict(zip(mesh.axis_names, mesh.devices.shape))}", flush=True,
        )

    project = project or "xvr"
    run = start_run(project=project, name=project, config=config, id=id)
    trainer = Trainer(**config, mesh=mesh)
    trainer.train(run)

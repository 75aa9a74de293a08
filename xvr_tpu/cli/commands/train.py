"""`xvr train` — train a pose regression model.

Full option surface of /root/reference/src/xvr/cli/commands/train.py:7-478
(same names, defaults, and categories); wandb logging is optional and falls
back to the local JSONL log when unavailable.
"""

from __future__ import annotations

import click

from ...config.trainer import args
from ..formatter import CategorizedCommand, categorized_option
from ..logging import start_run


@click.command(
    cls=CategorizedCommand,
    category_order=[
        "Required", "Data", "Sampling", "Renderer", "Model",
        "Optimizer", "Checkpoint", "Logging", "TPU",
    ],
)
@categorized_option("-v", "--volpath", required=True, type=click.Path(exists=True),
                    help="CT volume to train on — one NIfTI file, or a directory of them for multi-subject pretraining", category="Required")
@categorized_option("-m", "--maskpath", required=False, type=click.Path(exists=True),
                    help="Segmentation labelmap(s) matching volpath, enabling structure-masked rendering", category="Data")
@categorized_option("-c", "--ckptpath", required=False, type=click.Path(exists=True),
                    help="Existing model weights to start from (finetuning)", category="Checkpoint")
@categorized_option("-o", "--outpath", required=True, type=click.Path(),
                    help="Where checkpoints get written", category="Required")
@categorized_option("--r1", required=True, type=(float, float),
                    help="Sampling interval for the primary rotation, degrees", category="Sampling")
@categorized_option("--r2", required=True, type=(float, float),
                    help="Sampling interval for the secondary rotation, degrees", category="Sampling")
@categorized_option("--r3", required=True, type=(float, float),
                    help="Sampling interval for the tertiary rotation, degrees", category="Sampling")
@categorized_option("--tx", required=True, type=(float, float),
                    help="Sampling interval for translation along x, mm", category="Sampling")
@categorized_option("--ty", required=True, type=(float, float),
                    help="Sampling interval for translation along y (source distance), mm", category="Sampling")
@categorized_option("--tz", required=True, type=(float, float),
                    help="Sampling interval for translation along z, mm", category="Sampling")
@categorized_option("--sdd", required=True, type=float,
                    help="Focal length of the C-arm: X-ray source to detector plane, mm", category="Renderer")
@categorized_option("--height", required=True, type=int,
                    help="Synthesized image side length, pixels", category="Renderer")
@categorized_option("--delx", required=True, type=float,
                    help="Detector pixel pitch, mm", category="Renderer")
@categorized_option("--renderer", default=args.renderer,
                    type=click.Choice(["siddon", "trilinear", "siddon_exact", "trilinear_exact"]),
                    help="Ray-integration model for DRR synthesis; siddon runs the fast kernel on an eps=0.25-voxel smoothed profile (exact adjoint of the smoothed model; bound ~0.05 voxel, see docs/migration.md); *_exact pins the slow exact-model XLA path (autodiff gradients, no kernel upgrade)",
                    category="Renderer")
@categorized_option("--orientation", default=args.orientation, type=click.Choice(["AP", "PA"]),
                    help="Anatomical viewing convention for the volumes", category="Renderer")
@categorized_option("--reverse_x_axis", default=args.reverse_x_axis, is_flag=True,
                    help="Mirror the detector x-axis (radiologic display convention)", category="Renderer")
@categorized_option("--model_name", default=args.model_name, type=str,
                    help="Backbone architecture for the pose regressor (resnet18/34/50/101)", category="Model")
@categorized_option("--norm_layer", default=args.norm_layer, type=str,
                    help="Normalization used inside the backbone (groupnorm recommended)", category="Model")
@categorized_option("--pretrained", default=args.pretrained, is_flag=True,
                    help="Initialize the backbone from ImageNet-1k weights (torchvision state_dict via $XVR_PRETRAINED_DIR or the torch hub cache)", category="Model")
@categorized_option("--parameterization", default=args.parameterization, type=str,
                    help="Rotation representation the network predicts", category="Model")
@categorized_option("--convention", default=args.convention, type=str,
                    help="Euler axis order when predicting euler_angles", category="Model")
@categorized_option("--unit_conversion_factor", default=args.unit_conversion_factor, type=float,
                    help="Multiplier mapping network translation outputs to mm", category="Model")
@categorized_option("--p_augmentation", default=args.p_augmentation, type=float,
                    help="Chance each augmentation op fires on a training image", category="Model")
@categorized_option("--lr", default=args.lr, type=float,
                    help="Peak learning rate of the warmup-cosine schedule", category="Optimizer")
@categorized_option("--weight_ncc", default=args.weight_ncc, type=float,
                    help="Contribution of multiscale NCC image similarity to the loss", category="Optimizer")
@categorized_option("--weight_geo", default=args.weight_geo, type=float,
                    help="Contribution of the SE(3) double-geodesic pose error to the loss", category="Optimizer")
@categorized_option("--weight_dice", default=args.weight_dice, type=float,
                    help="Contribution of mask-overlap Dice to the loss", category="Optimizer")
@categorized_option("--weight_mvc", default=args.weight_mvc, type=float,
                    help="Contribution of cross-view pose consistency to the loss", category="Optimizer")
@categorized_option("--batch_size", default=args.batch_size, type=int,
                    help="Poses rendered and regressed per training step", category="Sampling")
@categorized_option("--n_total_itrs", default=args.n_total_itrs, type=int,
                    help="Total training steps", category="Optimizer")
@categorized_option("--n_warmup_itrs", default=args.n_warmup_itrs, type=int,
                    help="Steps of linear LR ramp before cosine decay", category="Optimizer")
@categorized_option("--n_grad_accum_itrs", default=args.n_grad_accum_itrs, type=int,
                    help="Steps whose gradients are averaged into one optimizer update", category="Optimizer")
@categorized_option("--n_save_every_itrs", default=args.n_save_every_itrs, type=int,
                    help="Checkpoint cadence, in steps", category="Optimizer")
@categorized_option("--disable_scheduler", default=args.disable_scheduler, is_flag=True,
                    help="Hold the learning rate constant instead of warmup-cosine", category="Optimizer")
@categorized_option("--reuse_optimizer", default=args.reuse_optimizer, is_flag=True,
                    help="Also restore optimizer state from ckptpath (exact resume)", category="Checkpoint")
@categorized_option("-w", "--warp", type=click.Path(exists=True),
                    help="Rigid ITK/ANTs transform aligning this CT to the frame the checkpoint was trained in", category="Checkpoint")
@categorized_option("--invert", default=args.invert, is_flag=True,
                    help="Apply the warp transform inverted", category="Checkpoint")
@categorized_option("--patch_size", default=None, type=str,
                    help="Train on random sub-volumes of this size ('h,w,d') instead of whole CTs", category="Data")
@categorized_option("--num_workers", default=args.num_workers, type=int,
                    help="No-op here (kept so reference scripts parse); volumes stay resident on device", category="Data")
@categorized_option("--pin_memory", default=args.pin_memory, is_flag=True,
                    help="No-op here (kept so reference scripts parse)", category="Data")
@categorized_option("--sample_weights", default=None, type=click.Path(exists=True),
                    help="File of per-volume sampling probabilities for multi-subject training", category="Data")
@categorized_option("--name", default=None, type=str, help="Label for this run in the experiment log", category="Logging")
@categorized_option("--id", default=None, type=str,
                    help="Stable run identifier, letting a restart append to the same log", category="Logging")
@categorized_option("--project", default=args.project, type=str,
                    help="Experiment-log project to file this run under", category="Logging")
@categorized_option("--n_devices", default=None, type=int,
                    help="Chips to train on (default: all visible devices)", category="TPU")
@categorized_option("--mesh_rays", default=None, type=int,
                    help="Ray-parallel mesh axis size (default: auto; 1 = pure data parallel)",
                    category="TPU")
def train(
    volpath, maskpath, ckptpath, outpath, r1, r2, r3, tx, ty, tz,
    sdd, height, delx, renderer, orientation, reverse_x_axis,
    model_name, norm_layer, pretrained, parameterization, convention,
    unit_conversion_factor, p_augmentation, lr, weight_ncc, weight_geo,
    weight_dice, weight_mvc, batch_size, n_total_itrs, n_warmup_itrs,
    n_grad_accum_itrs, n_save_every_itrs, disable_scheduler, reuse_optimizer,
    warp, invert, patch_size, num_workers, pin_memory, sample_weights,
    name, id, project, n_devices, mesh_rays,
):
    """Train a pose regression model."""
    from pathlib import Path

    from ...train import Trainer

    Path(outpath).mkdir(parents=True, exist_ok=True)

    if patch_size is not None:
        patch_size = tuple(int(x) for x in patch_size.split(","))

    alphamin, alphamax = r1
    betamin, betamax = r2
    gammamin, gammamax = r3
    txmin, txmax = tx
    tymin, tymax = ty
    tzmin, tzmax = tz

    weights = (
        [float(line) for line in Path(sample_weights).read_text().splitlines()]
        if sample_weights is not None
        else None
    )

    config = dict(
        volpath=volpath, maskpath=maskpath, ckptpath=ckptpath, outpath=outpath,
        alphamin=alphamin, alphamax=alphamax, betamin=betamin, betamax=betamax,
        gammamin=gammamin, gammamax=gammamax, txmin=txmin, txmax=txmax,
        tymin=tymin, tymax=tymax, tzmin=tzmin, tzmax=tzmax,
        sdd=sdd, height=height, delx=delx, renderer=renderer,
        orientation=orientation, reverse_x_axis=reverse_x_axis,
        parameterization=parameterization, convention=convention,
        model_name=model_name, pretrained=pretrained, norm_layer=norm_layer,
        unit_conversion_factor=unit_conversion_factor,
        p_augmentation=p_augmentation, lr=lr, weight_ncc=weight_ncc,
        weight_geo=weight_geo, weight_dice=weight_dice, weight_mvc=weight_mvc,
        batch_size=batch_size, n_total_itrs=n_total_itrs,
        n_warmup_itrs=n_warmup_itrs, n_grad_accum_itrs=n_grad_accum_itrs,
        n_save_every_itrs=n_save_every_itrs, disable_scheduler=disable_scheduler,
        reuse_optimizer=reuse_optimizer, patch_size=patch_size,
        num_workers=num_workers, pin_memory=pin_memory, weights=weights,
        warp=warp, invert=invert,
    )

    # Multi-chip: shard the pose batch (dp) and detector rows (rays) over the
    # visible slice. The reference has no multi-device path (SURVEY.md 2c);
    # this is the TPU-native scale-out, on by default whenever >1 chip is up.
    import jax

    mesh = None
    n_dev = n_devices if n_devices is not None else len(jax.devices())
    if n_dev > 1:
        from ...parallel.mesh import make_mesh

        mesh = make_mesh(n_dev, rays=mesh_rays)
        print(f"Training on {n_dev} devices, mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}",
              flush=True)

    run = start_run(project=project, name=name or project, config=config, id=id)
    trainer = Trainer(**config, mesh=mesh)
    trainer.train(run)

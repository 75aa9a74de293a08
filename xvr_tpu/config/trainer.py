"""Training defaults.

The VALUES are a compatibility contract with the reference CLI
(/root/reference/src/xvr/config/trainer.py): checkpoints and scripts written
against the reference must behave identically here. The layout below is our
own — fields are grouped by the stage of the training pipeline they feed and
annotated with what each knob actually does on the TPU path.
"""

from dataclasses import dataclass


@dataclass
class TrainerArgs:
    """Every `xvr train` option that has a default."""

    # --- The pose-regression CNN ------------------------------------------
    # A GroupNorm ResNet with two heads, predicting rotation (in the chosen
    # parameterization/convention) and translation (meters, scaled back to mm
    # by unit_conversion_factor).
    model_name: str = "resnet18"  # flax backbone: resnet18/34/50/101
    norm_layer: str = "groupnorm"  # batch statistics are pose-dependent; GN isn't
    pretrained: bool = False  # graft ImageNet weights from torchvision
    parameterization: str = "quaternion_adjugate"  # rotation head output space
    convention: str = "ZXY"  # Euler order when parameterization is euler_angles
    unit_conversion_factor: float = 1000.0  # head outputs meters -> mm

    # --- DRR synthesis ----------------------------------------------------
    # "trilinear" | "siddon" auto-upgrade to the MXU fast paths (tent /
    # quarter-voxel-smoothed trapezoid profiles with analytic adjoints);
    # "trilinear_exact" | "siddon_exact" pin the XLA golden renderers (the
    # exact models, autodiff gradients, orders of magnitude slower)
    renderer: str = "trilinear"
    orientation: str = "AP"  # anatomical handedness of the detector frame
    reverse_x_axis: bool = False  # radiologic x-flip

    # --- Optimization -----------------------------------------------------
    # Adam under adaptive gradient clipping with warmup-cosine decay; the
    # composite loss mixes image similarity (ncc), mask overlap (dice), pose
    # geodesic (geo), and optional multiview consistency (mvc).
    lr: float = 2e-4
    batch_size: int = 116  # DRRs per step (x n_grad_accum_itrs per update)
    n_total_itrs: int = 1_000_000
    n_warmup_itrs: int = 1_000
    n_grad_accum_itrs: int = 4
    n_save_every_itrs: int = 1_000
    disable_scheduler: bool = False  # constant lr instead of warmup-cosine
    weight_ncc: float = 1e0
    weight_geo: float = 1e-2
    weight_dice: float = 1e0
    weight_mvc: float = 0
    p_augmentation: float = 0.333  # per-op probability in the X-ray pipeline

    # --- Restarts ---------------------------------------------------------
    reuse_optimizer: bool = False  # also restore Adam moments from checkpoint
    invert: bool = False  # apply a template->patient warp inverted

    # --- Host-side data loading -------------------------------------------
    # Accepted for CLI parity; the JAX loader keeps volumes resident on
    # device, so both are no-ops here.
    num_workers: int = 4
    pin_memory: bool = False

    # --- Experiment tracking ----------------------------------------------
    project: str = "xvr"  # wandb project / JSONL namespace


args = TrainerArgs()

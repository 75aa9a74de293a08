"""Training defaults.

The VALUES are a compatibility contract with the reference CLI
(/root/reference/src/xvr/config/trainer.py): checkpoints and scripts written
against the reference must behave identically here. The layout below groups
them by the stage of the training pipeline they feed.
"""

from dataclasses import dataclass


@dataclass
class TrainerArgs:
    """Every `xvr train` option that has a default.

    Rendering: which DRR family synthesizes training images and how the
    detector frame maps to anatomy.
    """

    renderer: str = "trilinear"  # or "siddon"; both auto-upgrade to MXU paths
    orientation: str = "AP"  # anatomical handedness of the detector frame
    reverse_x_axis: bool = False  # radiologic x-flip

    # The pose-regression CNN: a GroupNorm ResNet with two heads, predicting
    # rotation (in the chosen parameterization/convention) and translation
    # (meters, scaled back to mm by unit_conversion_factor).
    model_name: str = "resnet18"
    norm_layer: str = "groupnorm"
    pretrained: bool = False
    parameterization: str = "quaternion_adjugate"
    convention: str = "ZXY"
    unit_conversion_factor: float = 1000.0
    p_augmentation: float = 0.333  # per-op probability in the X-ray pipeline

    # Optimization: Adam under AGC with warmup-cosine decay; the composite
    # loss mixes image similarity (ncc), mask overlap (dice), pose geodesic
    # (geo), and optional multiview consistency (mvc).
    lr: float = 2e-4
    weight_ncc: float = 1e0
    weight_geo: float = 1e-2
    weight_dice: float = 1e0
    weight_mvc: float = 0
    batch_size: int = 116  # DRRs per step (x n_grad_accum_itrs per update)
    n_total_itrs: int = 1_000_000
    n_warmup_itrs: int = 1_000
    n_grad_accum_itrs: int = 4
    n_save_every_itrs: int = 1_000
    disable_scheduler: bool = False

    # Restarts: whether a reloaded checkpoint also restores optimizer state,
    # and whether a template->patient warp should be applied inverted.
    reuse_optimizer: bool = False
    invert: bool = False

    # Host-side data loading knobs (accepted for CLI parity; the JAX loader
    # keeps volumes resident on device, so they are no-ops here).
    num_workers: int = 4
    pin_memory: bool = False

    # Experiment tracking namespace.
    project: str = "xvr"


args = TrainerArgs()

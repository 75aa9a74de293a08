"""Registration defaults.

As with the trainer table, the VALUES are the compatibility contract with
the reference CLI (/root/reference/src/xvr/config/registrar.py); the grouping
below follows the stages of a registration run: read the X-ray, render DRRs,
refine the pose, persist results.
"""

from dataclasses import dataclass


@dataclass
class RegistrarArgs:
    """Every `xvr register` option that has a default.

    X-ray ingestion: how intraoperative DICOMs are cropped, background-
    corrected, linearized, and matched by filename glob.
    """

    crop: int = 0  # border pixels removed before everything else
    subtract_background: bool = False  # mode-value background removal
    linearize: bool = False  # log-transform to line integrals
    equalize: bool = False  # differentiable histogram equalization
    reducefn: str = "max"  # collapse rule for multi-frame DICOMs
    pattern: str = "*.dcm"  # glob for X-ray files under a directory

    # DRR synthesis during refinement.
    reverse_x_axis: bool = False
    # "trilinear" | "siddon" auto-upgrade to MXU paths; "*_exact" pins the
    # exact-model XLA renderer (autodiff gradients, no kernel upgrade)
    renderer: str = "trilinear"
    voxel_shift: float = 0.0

    # Iterative refinement: a multiscale pyramid (detector downscale factors
    # in `scales`, iterations per stage in `n_itrs`) optimized by Adam with
    # split rotation/translation learning rates and plateau-based early exit.
    scales: str = "8"
    n_itrs: str = "500"
    parameterization: str = "euler_angles"
    convention: str = "ZXY"
    lr_rot: float = 1e-2
    lr_xyz: float = 1e0
    patience: int = 10  # iterations without improvement before an lr drop
    threshold: float = 1e-4  # relative improvement that resets the counter
    max_n_plateaus: int = 3  # lr drops before the stage exits
    # Objective-gated re-anneal (TPU extension): after the pyramid finishes,
    # re-run it seeded from the final pose with fresh Adam moments and a
    # fresh plateau budget, keeping the new pose per-image only when the
    # image similarity improved. Plateau-counted early exit is a noisy
    # stopping rule; one re-anneal recovers the iterations it cuts short
    # (round-3 bench, reference budget: 0.594 mm single-invocation mTRE vs
    # ~1.7 mm single-pass; batched median 0.412 mm — BENCH_LOCAL.json).
    # Stage executables are cached, so a restart costs iteration time only.
    # 0 restores the reference's single-pass behavior.
    max_restarts: int = 1
    # Multi-start width of EVERY pyramid pass (the first pass and each
    # re-anneal): the current pose plus S-1 jittered seeds, batched through
    # ONE pass (a K*S-pose render costs little more than K poses on the MXU,
    # and all passes share the same stage executables), keeping the
    # per-image argmax-similarity pose. A single-start pass cannot leave the
    # basin its init lands in; the spread can. Seed 0 is exact and a
    # jittered winner must clear the plateau threshold, so each pass never
    # returns worse than its single-start counterpart. 1 = single-start.
    restart_seeds: int = 4
    # Wide coarse-stage multi-start (TPU extension): when > restart_seeds,
    # sweep this many jittered starts through the COARSEST pyramid stage
    # only (nearly free on the MXU — the coarse detector is tiny and the
    # K*Sc batch rides the same slope-space matmuls) and continue the best
    # restart_seeds of them through the full pyramid. Targets the worst-case
    # tail: a wrong coarse basin is the error every later stage polishes.
    coarse_seeds: int = 0
    coarse_jitter_rot: float = 3.0  # deg, coarse-sweep jitter per seed
    coarse_jitter_xyz: float = 10.0  # mm, coarse-sweep jitter per seed
    restart_jitter_rot: float = 1.0  # deg, uniform jitter per seed
    # mm, uniform jitter per seed (all three camera axes: even beam-depth
    # moves are weakly observable through cone-beam magnification, and a
    # jittered seed only wins the argmax by a MATERIAL margin — the plateau
    # threshold — so noise ties can't displace the unperturbed continuation)
    restart_jitter_xyz: float = 4.0

    # Outputs and chatter.
    init_only: bool = False  # stop after the initial pose (no refinement)
    saveimg: bool = False  # also write rendered PNG overlays
    verbose: int = 1


args = RegistrarArgs()

"""xvr-tpu: TPU-native 2D/3D X-ray to volume rigid registration in JAX.

A from-scratch rebuild of the capabilities of eigenvivek/xvr (and its math
core, diffdrr) designed for TPU: differentiable DRR rendering via XLA and
Pallas kernels, SE(3) pose algebra as jit/vmap-safe pytrees, pose-regression
training with a fully-jitted step, and on-device iterative pose refinement.
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401

__all__ = ["geometry"]


def __getattr__(name):
    # Lazy subpackage access (keeps `import xvr_tpu` light for CLI startup)
    import importlib

    if name in (
        "render", "metrics", "models", "train", "registrar",
        "io", "utils", "parallel", "visualization", "cli", "config",
    ):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'xvr_tpu' has no attribute {name!r}")

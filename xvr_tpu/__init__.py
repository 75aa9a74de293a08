"""xvr-tpu: TPU-native 2D/3D X-ray to volume rigid registration in JAX.

A from-scratch rebuild of the capabilities of eigenvivek/xvr (and its math
core, diffdrr) designed for TPU: differentiable DRR rendering via XLA and
Pallas kernels, SE(3) pose algebra as jit/vmap-safe pytrees, pose-regression
training with a fully-jitted step, and on-device iterative pose refinement.
"""

__version__ = "0.1.0"

from . import geometry  # noqa: F401

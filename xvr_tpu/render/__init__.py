from .projector import Projector, orientation_transform
from .volume import Volume, make_test_volume, transform_hu_to_density
from .xla import raymarch_siddon, raymarch_trilinear

__all__ = [
    "Projector",
    "Volume",
    "make_test_volume",
    "orientation_transform",
    "raymarch_siddon",
    "raymarch_trilinear",
    "transform_hu_to_density",
]

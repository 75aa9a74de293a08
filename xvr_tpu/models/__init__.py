from .pretrained import find_imagenet_weights, load_imagenet_backbone
from .regressor import PoseRegressor, init_pose_regressor, load_model
from .resnet import ResNet, create_backbone

__all__ = [
    "PoseRegressor", "ResNet", "create_backbone", "find_imagenet_weights",
    "init_pose_regressor", "load_imagenet_backbone", "load_model",
]

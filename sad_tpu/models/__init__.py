from .arch import ModelArch, arch_from_config
from .resnet import ResNetBody, AffineChannel
from .fpn import FPNRetinaNetBackbone
from .retinanet import RetinaNet, RetinaNetHead
from .model_builder import create_model, trainable_mask, bias_mask

__all__ = [
    "ModelArch",
    "arch_from_config",
    "ResNetBody",
    "AffineChannel",
    "FPNRetinaNetBackbone",
    "RetinaNet",
    "RetinaNetHead",
    "create_model",
    "trainable_mask",
    "bias_mask",
]

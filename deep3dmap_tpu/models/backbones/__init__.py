from .fpn2d import MnasFPN
from .resnet_v1 import ResNetV1, ResFCN256Cls

__all__ = ["MnasFPN", "ResNetV1", "ResFCN256Cls"]

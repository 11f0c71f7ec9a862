from .bisenet import BiSeNet
from .bisenet_fp import BiSeNetFP, FaceParser
from .pspnet import PSPNet

__all__ = ["BiSeNet", "BiSeNetFP", "FaceParser", "PSPNet"]

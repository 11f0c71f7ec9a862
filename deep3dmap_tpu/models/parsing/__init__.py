from .bisenet import BiSeNet
from .pspnet import PSPNet

__all__ = ["BiSeNet", "PSPNet"]

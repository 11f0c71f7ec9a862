from .dense3d import ConvBlock3D, ResBlock3D, UNet3D
from .conv_gru3d import ConvGRU3D
from .global_volume import GlobalVolumeState, read_window, write_window, reset_volumes

__all__ = [
    "ConvBlock3D",
    "ResBlock3D",
    "UNet3D",
    "ConvGRU3D",
    "GlobalVolumeState",
    "read_window",
    "write_window",
    "reset_volumes",
]

from .dense3d import ConvBlock3D, ResBlock3D, UNet3D
from .conv_gru3d import ConvGRU3D
from .global_volume import GlobalVolumeState, read_window, write_window, reset_volumes
from .gnerf import GNeRFRender
from .dynamic_patch_discriminator import Discriminator
from .inversion_net import InversionNet
from .embeddings import PoseParameters, high_dim_embedding, r6d2mat, pose_to_d9
from .norm import SyncBatchNorm

__all__ = [
    "SyncBatchNorm",
    "ConvBlock3D", "ResBlock3D", "UNet3D", "ConvGRU3D",
    "GlobalVolumeState", "read_window", "write_window", "reset_volumes",
    "GNeRFRender", "Discriminator", "InversionNet", "PoseParameters",
    "high_dim_embedding", "r6d2mat", "pose_to_d9",
]

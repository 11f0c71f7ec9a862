from .compose import Compose
from .formating import Collect, ToFloat32, ImageToArray
from .loading import LoadImageFromFile, LoadArrayUsingNp, LoadMatDictUsingSio
from .transforms import Resize, Normalize, RandomFlip, Pad, CenterCrop
from .transforms_seq import (
    SeqResizeImage,
    SeqNormalizeImages,
    SeqIntrinsicsPoseToProjection,
    SeqRandomTransformSpace,
)

__all__ = [
    "Compose", "Collect", "ToFloat32", "ImageToArray",
    "LoadImageFromFile", "LoadArrayUsingNp", "LoadMatDictUsingSio",
    "Resize", "Normalize", "RandomFlip", "Pad", "CenterCrop",
    "SeqResizeImage", "SeqNormalizeImages",
    "SeqIntrinsicsPoseToProjection", "SeqRandomTransformSpace",
]

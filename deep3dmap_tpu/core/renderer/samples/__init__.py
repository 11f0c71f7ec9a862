from .patch_sampler import FlexPatchSampler, FullImageSampler, RescalePatchSampler
from .ray_sampler import RaySampler

__all__ = ["FlexPatchSampler", "FullImageSampler", "RescalePatchSampler", "RaySampler"]

from .fusion import TSDFParams, tsdf_integrate, tsdf_fuse_frames, tsdf_pyramid_from_depths

__all__ = ["TSDFParams", "tsdf_integrate", "tsdf_fuse_frames", "tsdf_pyramid_from_depths"]

from .uv_sampler import UVRasterization, precompute_uv_rasterization, sample_uv_texture

__all__ = ["UVRasterization", "precompute_uv_rasterization", "sample_uv_texture"]

from .mesh import (
    MeshSpec,
    make_mesh,
    get_dist_info,
    init_dist,
    shard_batch,
    replicate,
    data_spec,
    master_only,
)
from .spatial import (
    conv_gru3d_halo,
    halo_pad,
    shard_global_volumes,
    tsdf_fuse_frames_sharded,
    volume_sharding,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "get_dist_info",
    "init_dist",
    "shard_batch",
    "replicate",
    "data_spec",
    "master_only",
    "conv_gru3d_halo",
    "halo_pad",
    "shard_global_volumes",
    "tsdf_fuse_frames_sharded",
    "volume_sharding",
]

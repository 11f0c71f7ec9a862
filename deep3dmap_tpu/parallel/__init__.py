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
from .fsdp import (
    fsdp_spec,
    fsdp_specs,
    fsdp_shard,
    zero_specs,
    zero_shard,
    separate_group_specs,
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
    "fsdp_spec",
    "fsdp_specs",
    "fsdp_shard",
    "zero_specs",
    "zero_shard",
    "separate_group_specs",
    "conv_gru3d_halo",
    "halo_pad",
    "shard_global_volumes",
    "tsdf_fuse_frames_sharded",
    "volume_sharding",
]

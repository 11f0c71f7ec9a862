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

__all__ = [
    "MeshSpec",
    "make_mesh",
    "get_dist_info",
    "init_dist",
    "shard_batch",
    "replicate",
    "data_spec",
    "master_only",
]

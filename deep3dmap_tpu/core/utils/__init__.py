from .marching_cubes import marching_tetrahedra, tsdf_to_mesh
from .scene_assembler import SceneAssembler
from .io_ply import write_ply, read_ply

__all__ = ["marching_tetrahedra", "tsdf_to_mesh", "SceneAssembler",
           "write_ply", "read_ply"]

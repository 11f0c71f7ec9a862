"""deep3dmap_tpu: a TPU-native 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
achao2013/deep3dmap (config/registry-driven 3D reconstruction engine covering
NeuralRecon-style monocular-video TSDF reconstruction, face reconstruction
paths, differentiable rendering losses and radiance-field workloads), built
idiomatically for TPU hardware: functional jitted train steps over device
meshes, dense static-shape voxel pyramids instead of sparse tensors, and
Pallas kernels for the hot ops.
"""

from .version import __version__

__all__ = ["__version__"]

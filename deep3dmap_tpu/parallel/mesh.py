"""Device-mesh + sharding utilities — the TPU-native parallel layer.

This replaces the reference's whole in-process parallelism stack
(/root/reference/deep3dmap/parallel/{distributed,data_parallel,
data_container,collate,scatter_gather}.py and runners/dist_utils.py): instead
of DataContainer scattering and NCCL DDP wrappers, we build a
``jax.sharding.Mesh`` over the available devices and annotate arrays with
``NamedSharding``s; XLA SPMD inserts all collectives (psum/all_gather/
reduce_scatter) over ICI/DCN.

Axis conventions used framework-wide:
  - ``data``:   batch / fragment axis (pure data parallelism; DDP equivalent)
  - ``model``:  optional parameter/spatial sharding axis (FSDP / volume-block
                sharding for the global TSDF state)
"""
from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh description, constructed from config."""

    axes: tuple = ("data",)
    shape: Optional[tuple] = None  # None -> all devices on first axis

    def build(self, devices: Optional[Sequence] = None) -> Mesh:
        devices = list(devices if devices is not None else jax.devices())
        if self.shape is None:
            shape = [len(devices)] + [1] * (len(self.axes) - 1)
        else:
            shape = list(self.shape)
            # -1 wildcard fills with remaining devices
            if -1 in shape:
                known = int(np.prod([s for s in shape if s != -1]))
                shape[shape.index(-1)] = len(devices) // known
        n = int(np.prod(shape))
        if n > len(devices):
            raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
        dev_array = np.array(devices[:n]).reshape(shape)
        return Mesh(dev_array, axis_names=self.axes)


def make_mesh(axes: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    return MeshSpec(tuple(axes), tuple(shape) if shape is not None else None).build(devices)


def init_dist(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
              process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (one process per host).

    The TPU-native analogue of the reference's ``init_dist(launcher='pytorch',
    backend='nccl')`` (/root/reference/deep3dmap/runners/dist_utils.py:19).  On
    a managed TPU pod all args are discovered from the environment; explicit
    args support manual launchers.
    """
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def get_dist_info() -> tuple:
    """(rank, world_size) in units of processes (hosts)."""
    return jax.process_index(), jax.process_count()


def master_only(func):
    """Run only on process 0 (parity: dist_utils.py:93)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return func(*args, **kwargs)
        return None

    return wrapper


def data_spec(mesh: Mesh, axis: str = "data") -> P:
    """PartitionSpec sharding the leading (batch) dim over ``axis``."""
    if axis in mesh.axis_names:
        return P(axis)
    return P()


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host-local pytree of numpy arrays onto the mesh, sharded on the
    leading dimension.  Replaces DataContainer/scatter
    (/root/reference/deep3dmap/parallel/scatter_gather.py:9).

    Single-process (incl. the virtual multi-device test mesh): a plain
    ``device_put`` with a NamedSharding.  Multi-process (the
    ``tools/train.py --launcher jax`` pod path): each process holds only its
    rank-local slice of the global batch (DistributedSampler), so leaves are
    promoted with ``host_local_array_to_global_array`` — the local leading
    dim concatenates across processes into the global batch axis.

    Non-numeric metadata (scene names, fragment ids — what the reference
    carries through DataContainer metadata) cannot live on device: dict
    entries whose leaves are not numeric arrays are DROPPED from the device
    batch (the jitted step cannot take them either way; evaluation flows
    keep metadata host-side, see tools/test.py split_meta).
    """
    if isinstance(batch, dict):
        def _numeric(v):
            leaves = jax.tree_util.tree_leaves(v)
            return leaves and all(
                isinstance(l, (int, float, bool, np.number, np.bool_))
                or (isinstance(l, np.ndarray) and l.dtype.kind in "bifuc")
                or hasattr(l, "dtype") and getattr(l, "dtype", None) is not None
                and np.dtype(l.dtype).kind in "bifuc"
                for l in leaves)

        batch = {k: v for k, v in batch.items() if _numeric(v)}
    spec = data_spec(mesh, axis)

    n_shards = mesh.shape.get(axis, 1)
    multiproc = jax.process_count() > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat)

    if multiproc:
        from jax.experimental import multihost_utils

        def _put(x):
            x = np.asarray(x)
            if x.ndim == 0:
                return multihost_utils.host_local_array_to_global_array(
                    x, mesh, P())
            # per-process shard count along the data axis
            procs = len({d.process_index for d in mesh.devices.flat})
            local_n = n_shards // max(procs, 1)
            if local_n > 1 and x.shape[0] % local_n != 0:
                return multihost_utils.host_local_array_to_global_array(
                    x, mesh, P())
            return multihost_utils.host_local_array_to_global_array(
                x, mesh, spec)

        return jax.tree_util.tree_map(_put, batch)

    def _put(x):
        x = np.asarray(x)
        # replicate scalars and batches not divisible by the data axis
        if x.ndim == 0 or (n_shards > 1 and x.shape[0] % n_shards != 0):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)

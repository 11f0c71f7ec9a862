"""Spatial sharding of scene volumes over the device mesh.

The SURVEY §5.7 design: the reference's long-sequence dimension is the
monocular video stream fused into a growing TSDF volume; the TPU-native
scaling strategy partitions *the volume itself* (and with it the recurrent
GRU hidden state) across devices — the context-parallelism analogue.

Because TSDF integration and GRU fusion are voxel-local, a volume sharded on
its leading spatial axis needs NO communication for the update itself; only
fragment windows that straddle shard boundaries induce (XLA-inserted)
collective-permutes for the dynamic-slice reads/writes.  The fragment's
image features are replicated (they are small relative to the volume).

Helpers here annotate the shardings; XLA SPMD does the rest.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..core.tsdf.fusion import TSDFParams, tsdf_integrate


def volume_sharding(mesh: Mesh, axis: str = "model",
                    batch_axis: Optional[str] = None) -> NamedSharding:
    """Shard (B, GX, GY, GZ, C) hidden volumes on GX over ``axis`` (and the
    batch dim over ``batch_axis`` when given)."""
    spatial = axis if axis in mesh.axis_names and mesh.shape[axis] > 1 else None
    batch = (batch_axis if batch_axis in mesh.axis_names
             and mesh.shape[batch_axis] > 1 else None)
    if spatial is None and batch is None:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(batch, spatial))


def shard_global_volumes(model_state, mesh: Mesh, axis: str = "model",
                         batch_axis: Optional[str] = None):
    """Place the recurrent global volumes spatially sharded; leaves other
    model_state entries replicated."""
    vs = volume_sharding(mesh, axis, batch_axis)
    repl = NamedSharding(mesh, P())

    def _put(path, x):
        names = [str(getattr(p, "key", p)) for p in path]
        if "global_hidden" in names and hasattr(x, "ndim") and x.ndim == 5:
            return jax.device_put(x, vs)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map_with_path(_put, model_state)


def shard_train_state(state, mesh: Mesh, axis: Optional[str] = "model",
                      batch_axis: str = "data"):
    """Place a TrainState on the mesh: params/opt/rng/step replicated, the
    recurrent model_state volumes spatially sharded (``shard_global_volumes``)
    — the production placement `tools/train.py` reaches through
    ``BaseRunner.setup`` when cfg.mesh declares a ``model`` axis."""
    repl = NamedSharding(mesh, P())

    def _repl(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), repl), tree)

    return state.replace(
        params=_repl(state.params),
        opt_state=_repl(state.opt_state),
        model_state=shard_global_volumes(state.model_state, mesh, axis=axis,
                                         batch_axis=batch_axis),
        rng=jax.device_put(state.rng, repl),
        step=jax.device_put(jnp.asarray(state.step), repl),
    )


def tsdf_fuse_frames_sharded(depth_ims, cam_intrs, cam_poses, origin,
                             params: TSDFParams, mesh: Mesh, axis: str = "x"):
    """TSDF fusion with the volume sharded on X over ``axis`` — each device
    integrates its slab; zero inter-chip communication in the hot loop
    (frames are replicated, integration is voxel-local).

    Returns (tsdf, weight) as sharded global arrays.
    """
    n = mesh.shape[axis]
    X = params.dim[0]
    assert X % n == 0, f"volume X={X} must divide over {n} devices"

    vol_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    tsdf0 = jax.device_put(jnp.ones(params.dim, jnp.float32), vol_sharding)
    w0 = jax.device_put(jnp.zeros(params.dim, jnp.float32), vol_sharding)
    frames = jax.device_put((depth_ims, cam_intrs, cam_poses), repl)
    origin = jax.device_put(jnp.asarray(origin), repl)

    @partial(jax.jit, static_argnames=("p",),
             out_shardings=(vol_sharding, vol_sharding))
    def fuse(tsdf, weight, frames, origin, p: TSDFParams):
        def body(carry, frame):
            t, w = carry
            d, k, pose = frame
            t, w = tsdf_integrate(t, w, d, k, pose, origin, p)
            return (t, w), None

        (tsdf, weight), _ = jax.lax.scan(body, (tsdf, weight), frames)
        return tsdf, weight

    return fuse(tsdf0, w0, frames, origin, params)


# ------------------------------------------------------- explicit halo SPMD
def halo_pad(x: jnp.ndarray, axis_name: str, halo: int = 1) -> jnp.ndarray:
    """Pad a device-local volume block (B, Xl, Y, Z, C) with ``halo`` slabs
    exchanged from mesh neighbors along ``axis_name`` via ppermute over ICI.
    Boundary devices receive zeros — matching a global SAME-padded conv."""
    n = jax.lax.psum(1, axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # my last slab -> right nbr
    bwd = [(i + 1, i) for i in range(n - 1)]   # my first slab -> left nbr
    from_left = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _halo_conv3d(x_blk, kernel, bias, axis_name: str):
    """3D conv (kernel DHWIO, odd size) on an X-sharded block: halo-exchange
    on X, VALID there, SAME on Y/Z — bitwise-equal to the unsharded conv."""
    k = kernel.shape[0]
    halo = k // 2
    pad = halo_pad(x_blk, axis_name, halo)
    out = jax.lax.conv_general_dilated(
        pad, kernel, window_strides=(1, 1, 1),
        padding=((0, 0), (halo, halo), (halo, halo)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + bias


def conv_gru3d_halo(gru_params, h, x, mesh: Mesh, axis: str = "model",
                    batch_axis: Optional[str] = None):
    """ConvGRU3D fusion with the hidden volume sharded on its X axis and
    *explicit* halo exchange before every gate conv (the §5.7 halo design,
    rather than leaving boundary windows to XLA's generated collectives).

    gru_params: the ``ConvGRU3D`` param collection ({'convzr': {'kernel',
    'bias'}, 'convq': ...}; z and r share one fused conv, conv_gru3d.py).
    h (B, GX, GY, GZ, Ch) hidden and x (B, GX, GY, GZ, Cx) input volumes;
    GX must divide mesh.shape[axis].  ``batch_axis`` additionally shards the
    leading batch dim (the production data axis) — halos only ride ``axis``.

    Exact: each gate conv sees true neighbor data, so the result equals the
    single-device ConvGRU3D apply on the full volume.
    """
    p = gru_params["params"] if "params" in gru_params else gru_params

    def local(h_blk, x_blk, pzr, pq):
        c = h_blk.shape[-1]
        hx = jnp.concatenate([h_blk, x_blk], axis=-1)
        zr = _halo_conv3d(hx, pzr["kernel"], pzr["bias"], axis)
        z = jax.nn.sigmoid(zr[..., :c])
        r = jax.nn.sigmoid(zr[..., c:])
        rhx = jnp.concatenate([r * h_blk, x_blk], axis=-1)
        q = jnp.tanh(_halo_conv3d(rhx, pq["kernel"], pq["bias"], axis))
        return (1.0 - z) * h_blk + z * q

    b = (batch_axis if batch_axis in mesh.axis_names
         and mesh.shape[batch_axis] > 1 else None)
    spec = P(b, axis)
    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec, spec, P(), P()),
                   out_specs=spec)
    return fn(h, x, p["convzr"], p["convq"])

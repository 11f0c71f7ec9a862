"""Block-sparse voxel volumes: fixed-capacity active 8³ blocks, TPU-native.

The reference regularizes only the *occupied* voxel set with torchsparse
sparse convolution (/root/reference/deep3dmap/models/modulars/
sparse_cnn.py:74-175, driven by the coarse-to-fine sparsification at
neucon_network.py:180-207).  Voxel-level sparsity maps terribly onto TPU:
XLA row gathers/scatters are row-rate-bound (~150M rows/s) and
``jnp.nonzero`` over 96³ costs ~8 ms alone.  Block sparsity is the
TPU-native middle ground (SURVEY.md §7 "dense-block sparse"):

  * the dim³ volume is partitioned into (dim/bs)³ blocks of bs³ voxels;
  * a fixed-capacity set of MAXB active blocks is selected from a block
    mask — ``nonzero`` over (dim/bs)³ ≤ 1728 elements is trivial;
  * block data moves with gathers/scatters of MAXB *big* rows (bs³·C
    contiguous elements) — bandwidth-bound, not row-rate-bound;
  * convolutions run VALID on halo-padded blocks: dense batched conv on
    (MAXB, bs+2, bs+2, bs+2, C), so the MXU sees ~occupancy× less work
    than the dense-masked formulation;
  * the 1-voxel halo is assembled by gathering each block's 27-neighborhood
    through a slot table (block id -> capacity slot, -1 = inactive -> zeros),
    reproducing exactly what the sparse conv's neighborhood lookup does.

All shapes are static; everything jits and shards (the block axis is a clean
data-parallel / spatial axis).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockSet(NamedTuple):
    """Active-block bookkeeping for one volume (batched).

    ids: (B, MAXB) int32 — linear block indices into the (nb³) grid (padded
        with 0 beyond ``n`` — masked by ``valid``).
    valid: (B, MAXB) bool — real block vs padding slot.
    slot_of: (B, nb³) int32 — inverse map block-id -> slot, -1 if inactive.
    nb: int — blocks per side (static).
    bs: int — block side in voxels (static).
    """

    ids: jnp.ndarray
    valid: jnp.ndarray
    slot_of: jnp.ndarray
    nb: int
    bs: int


def select_blocks(block_mask: jnp.ndarray, maxb: int, bs: int) -> BlockSet:
    """Pick up to ``maxb`` active blocks from a (B, nb, nb, nb) bool mask.

    ``nonzero(size=maxb)`` over nb³ ≤ a few thousand elements — cheap,
    unlike voxel-level nonzero over dim³.
    """
    B, nb = block_mask.shape[0], block_mask.shape[1]
    flat = block_mask.reshape(B, nb ** 3)

    def one(m):
        (ids,) = jnp.nonzero(m, size=maxb, fill_value=0)
        ids = ids.astype(jnp.int32)
        n = m.sum()
        valid = jnp.arange(maxb) < n
        # padding slots all carry id 0 — route their writes to a scratch
        # entry so a real block 0 keeps its slot
        slot = jnp.full((nb ** 3 + 1,), -1, jnp.int32)
        safe = jnp.where(valid, ids, nb ** 3)
        slot = slot.at[safe].set(jnp.arange(maxb, dtype=jnp.int32))[:-1]
        return ids, valid, slot

    ids, valid, slot = jax.vmap(one)(flat)
    return BlockSet(ids=ids, valid=valid, slot_of=slot, nb=int(nb), bs=bs)


def block_mask_from_voxels(vox_mask: jnp.ndarray, bs: int) -> jnp.ndarray:
    """(B, d, d, d) voxel mask -> (B, nb, nb, nb) any-reduction block mask."""
    B, d = vox_mask.shape[0], vox_mask.shape[1]
    nb = d // bs
    m = vox_mask.reshape(B, nb, bs, nb, bs, nb, bs)
    return m.any(axis=(2, 4, 6))


def _to_blocked(vol: jnp.ndarray, bs: int) -> jnp.ndarray:
    """(B,d,d,d,C) -> (B, nb³, bs,bs,bs, C) blocked layout (one transpose)."""
    B, d = vol.shape[0], vol.shape[1]
    C = vol.shape[-1]
    nb = d // bs
    v = vol.reshape(B, nb, bs, nb, bs, nb, bs, C)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return v.reshape(B, nb ** 3, bs, bs, bs, C)


def _from_blocked(blocks: jnp.ndarray, nb: int) -> jnp.ndarray:
    """(B, nb³, bs,bs,bs, C) -> (B,d,d,d,C)."""
    B, _, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    v = blocks.reshape(B, nb, nb, nb, bs, bs, bs, C)
    v = v.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return v.reshape(B, nb * bs, nb * bs, nb * bs, C)


def _line_rows(bset: BlockSet) -> jnp.ndarray:
    """Row index of every contiguous z-line of the active blocks.

    The dense (B,d,d,d,C) volume flattens to (B, d*d*nb, bs*C) rows, one per
    (x, y, z-block) z-line — the largest memory-contiguous unit a bs-block
    touches.  Returns (B, MAXB*bs²) int32 rows, ordered (block, vx, vy) so the
    gathered rows reshape straight into (MAXB, bs, bs, bs, C).
    """
    nb, bs = bset.nb, bset.bs
    d = nb * bs
    bx = bset.ids // (nb * nb)
    by = (bset.ids // nb) % nb
    bz = bset.ids % nb                       # (B, MAXB)
    r = jnp.arange(bs)
    vx, vy = jnp.meshgrid(r, r, indexing="ij")
    vx, vy = vx.reshape(-1), vy.reshape(-1)  # (bs²,)
    gx = bx[..., None] * bs + vx             # (B, MAXB, bs²)
    gy = by[..., None] * bs + vy
    rows = (gx * d + gy) * nb + bz[..., None]
    return rows.reshape(rows.shape[0], -1).astype(jnp.int32)


def dense_to_blocks(vol: jnp.ndarray, bset: BlockSet) -> jnp.ndarray:
    """Gather active blocks: (B,d,d,d,C) -> (B, MAXB, bs,bs,bs, C).

    One flat gather of MAXB·bs² contiguous z-line rows (batch folded into the
    row index).  ~1.6x the full-volume transpose+take formulation on chip —
    the transpose materializes the whole dim³ volume twice, this touches only
    the active blocks' bytes (r4 trace: the 8-D transpose copies were ~2.7
    ms/step of the 96³ inference step).
    """
    B, d = vol.shape[0], vol.shape[1]
    C = vol.shape[-1]
    nb, bs = bset.nb, bset.bs
    R = d * d * nb
    flat = vol.reshape(B * R, bs, C)
    rows = _line_rows(bset) + (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
    # mode="clip": rows are in-range by construction; default fill mode
    # would add a bounds select pass over the gathered blocks
    g = jnp.take(flat, rows.reshape(-1), axis=0, mode="clip")
    maxb = bset.ids.shape[1]
    return g.reshape(B, maxb, bs, bs, bs, C)


def blocks_to_dense(blocks: jnp.ndarray, bset: BlockSet, fill=0.0) -> jnp.ndarray:
    """Scatter active blocks back to a dense volume (padding slots dropped).

    One flat unique-row scatter of z-lines into a fill-initialized volume
    (padding slots routed to a dropped scratch row) — ~3x the
    transpose-based scatter on chip.
    """
    B, maxb, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    nb = bset.nb
    d = nb * bs
    R = d * d * nb
    n_slots = B * maxb * bs * bs
    # every slot gets a DISTINCT row — real rows are unique z-lines and each
    # padding slot gets its own scratch row past the volume — so the scatter
    # honestly qualifies for unique_indices + promise_in_bounds, taking the
    # vectorized emitter (r5 trace: the non-unique `set` path ran at 2 GiB/s
    # / ~20M rows/s, ~0.4 ms per call at 96³)
    flat = jnp.full((B * R + n_slots, bs * C), fill, blocks.dtype)
    rows = _line_rows(bset) + (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
    vals = blocks.reshape(n_slots, bs * C)
    valid = jnp.repeat(bset.valid, bs * bs, axis=1)
    safe = jnp.where(valid.reshape(-1), rows.reshape(-1),
                     B * R + jnp.arange(n_slots, dtype=jnp.int32))
    out = flat.at[safe].set(vals, unique_indices=True,
                            mode="promise_in_bounds")[:B * R]
    return out.reshape(B, d, d, d, C)


def gather_halo(blocks: jnp.ndarray, bset: BlockSet, halo: int = 1) -> jnp.ndarray:
    """(B, MAXB, bs,bs,bs, C) -> (B, MAXB, bs+2h, bs+2h, bs+2h, C).

    Assembles each active block's 27-neighborhood (inactive neighbors and
    out-of-volume positions read as zeros) and crops the halo window — the
    block-granular equivalent of the sparse conv's neighbor lookup.

    Traffic engineering: a naive gather of 27 full neighbor blocks moves 27x
    the block bytes per conv.  Instead the source array is pre-sliced into
    the 3x3x3 slab categories a halo window actually consumes (lo-h voxels /
    full bs / hi-h voxels per axis), each category is gathered with its own
    neighbor-offset id table, and the window is assembled with nested
    concatenates — total gathered bytes = the (bs+2h)³ window exactly
    (~(1+2h/bs)³ x block bytes, ~2x at bs=8, h=1 instead of 27x).
    """
    B, maxb, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    nb = bset.nb
    if halo > bs:
        raise ValueError(f"halo {halo} > block size {bs}")

    bx = bset.ids // (nb * nb)
    by = (bset.ids // nb) % nb
    bz = bset.ids % nb  # (B, MAXB)

    def slot_for(dx, dy, dz):
        """Neighbor slot ids at offset (dx,dy,dz); -1 -> zeros."""
        nx, ny, nz = bx + dx, by + dy, bz + dz
        inb = ((nx >= 0) & (nx < nb) & (ny >= 0) & (ny < nb)
               & (nz >= 0) & (nz < nb))
        nid = (jnp.clip(nx, 0, nb - 1) * nb + jnp.clip(ny, 0, nb - 1)) * nb \
            + jnp.clip(nz, 0, nb - 1)
        ns = jax.vmap(lambda s, i: jnp.take(s, i, axis=0, mode="clip"))(
            bset.slot_of, nid)
        ns = jnp.where(inb, ns, -1)
        return jnp.where(bset.valid, ns, -1)  # (B, MAXB)

    # per-axis slab slices a window consumes from a neighbor at offset d:
    #   d=-1 -> the neighbor's last h voxels; d=0 -> all; d=+1 -> first h
    sl = {-1: slice(bs - halo, bs), 0: slice(0, bs), 1: slice(0, halo)}

    def piece(dx, dy, dz):
        src = blocks[:, :, sl[dx], sl[dy], sl[dz], :]
        zero = jnp.zeros((B, 1) + src.shape[2:], blocks.dtype)
        table = jnp.concatenate([src, zero], axis=1)  # (B, MAXB+1, ...)
        s = slot_for(dx, dy, dz)
        safe = jnp.where(s >= 0, s, maxb)
        return jax.vmap(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))(
            table, safe)

    offs = (-1, 0, 1)
    xs = []
    for dx in offs:
        ys = []
        for dy in offs:
            ys.append(jnp.concatenate([piece(dx, dy, dz) for dz in offs],
                                      axis=4))
        xs.append(jnp.concatenate(ys, axis=3))
    return jnp.concatenate(xs, axis=2)


def blocks_to_dense_over(blocks: jnp.ndarray, bset: BlockSet,
                         base: jnp.ndarray) -> jnp.ndarray:
    """Scatter active blocks onto an existing dense volume.

    Inactive blocks keep ``base``'s data — the block-granular analogue of the
    reference GRU fusion updating only the current sparse set of the global
    hidden volume (gru_fusion.py:122-150).
    """
    B, maxb, bs = blocks.shape[0], blocks.shape[1], blocks.shape[2]
    C = blocks.shape[-1]
    nb = bset.nb
    d = nb * bs
    R = d * d * nb
    # flat unique-row z-line scatter onto the existing volume — ~6x the
    # blocked-transpose formulation on chip (the transpose round-trips the
    # whole dim³ array; this writes only the active blocks' rows).  Padding
    # slots land on distinct scratch rows so unique_indices holds honestly
    # (the non-unique emitter measured 19 GiB/s here, r5 trace).
    n_slots = B * maxb * bs * bs
    flat = base.reshape(B * R, bs * C)
    flat = jnp.concatenate(
        [flat, jnp.zeros((n_slots, bs * C), base.dtype)], axis=0)
    rows = _line_rows(bset) + (jnp.arange(B, dtype=jnp.int32) * R)[:, None]
    vals = blocks.reshape(n_slots, bs * C).astype(base.dtype)
    valid = jnp.repeat(bset.valid, bs * bs, axis=1)
    safe = jnp.where(valid.reshape(-1), rows.reshape(-1),
                     B * R + jnp.arange(n_slots, dtype=jnp.int32))
    out = flat.at[safe].set(vals, unique_indices=True,
                            mode="promise_in_bounds")[:B * R]
    return out.reshape(B, d, d, d, C)


def _decode_ids(ids: jnp.ndarray, nb: int):
    """Linear block ids -> (bx, by, bz) on the (nb)³ grid."""
    return ids // (nb * nb), (ids // nb) % nb, ids % nb


def child_block_mask(occ_blocks: jnp.ndarray, parent_bset: BlockSet) -> jnp.ndarray:
    """Child-level active-block mask from the parent's block-domain occupancy.

    The next pyramid level (2x resolution, same block side bs) has nb_c = 2*nb
    blocks per side; child block (2px+ox, 2py+oy, 2pz+oz) is active iff the
    (ox,oy,oz) octant of parent block (px,py,pz) contains any occupied voxel.
    Replaces ``block_mask_from_voxels`` on a dense mask so consecutive block
    levels never materialize dense volumes (the block-domain analogue of the
    reference's upsample-the-sparse-set step, neucon_network.py:180-207).

    Args:
        occ_blocks: (B, MAXB, bs, bs, bs) bool parent occupancy per block.
        parent_bset: the parent level's BlockSet.

    Returns:
        (B, nb_c, nb_c, nb_c) bool child block mask.
    """
    B, maxb, bs = occ_blocks.shape[0], occ_blocks.shape[1], occ_blocks.shape[2]
    nb = parent_bset.nb
    nb_c = nb * 2
    h = bs // 2
    octs = occ_blocks.reshape(B, maxb, 2, h, 2, h, 2, h).any(axis=(3, 5, 7))
    octs = octs.reshape(B, maxb, 8)  # (ox*4 + oy*2 + oz)

    px, py, pz = _decode_ids(parent_bset.ids, nb)
    r = jnp.arange(2)
    ox, oy, oz = jnp.meshgrid(r, r, r, indexing="ij")
    ox, oy, oz = ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)  # (8,)
    cx = px[..., None] * 2 + ox
    cy = py[..., None] * 2 + oy
    cz = pz[..., None] * 2 + oz
    cid = (cx * nb_c + cy) * nb_c + cz  # (B, MAXB, 8)

    def one(ids, bits, valid):
        safe = jnp.where(valid[:, None], ids, nb_c ** 3).reshape(-1)
        m = jnp.zeros((nb_c ** 3 + 1,), bool)
        return m.at[safe].max(bits.reshape(-1))[:-1]

    mask = jax.vmap(one)(cid, octs, parent_bset.valid)
    return mask.reshape(B, nb_c, nb_c, nb_c)


def gather_parent_octants(parent_blocks: jnp.ndarray, parent_bset: BlockSet,
                          child_bset: BlockSet,
                          fill: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Per-child-block parent context, read directly from parent block slots.

    For each active child block, returns the (bs/2)³ parent-volume region it
    refines — one MAXB_c-row gather from the parent's octant-sliced block
    array instead of a blocks_to_dense/dense_to_blocks roundtrip through the
    full dim³ volume (the inter-level hop of the coarse-to-fine pyramid,
    neucon_network.py:180-207).

    Args:
        parent_blocks: (B, MAXB_p, bs, bs, bs, C).
        parent_bset: parent BlockSet (grid nb).
        child_bset: child BlockSet (grid 2*nb, same bs).
        fill: scalar or (C,) vector for regions whose parent block is
            inactive (e.g. tsdf channels fill with 1.0 = empty space).

    Returns:
        (B, MAXB_c, bs/2, bs/2, bs/2, C).
    """
    B, maxb_p, bs = (parent_blocks.shape[0], parent_blocks.shape[1],
                     parent_blocks.shape[2])
    C = parent_blocks.shape[-1]
    nb = parent_bset.nb
    h = bs // 2

    # octant-sliced parent: (B, MAXB_p*8, h, h, h, C), octant = ox*4+oy*2+oz
    octs = parent_blocks.reshape(B, maxb_p, 2, h, 2, h, 2, h, C)
    octs = octs.transpose(0, 1, 2, 4, 6, 3, 5, 7, 8)
    octs = octs.reshape(B, maxb_p * 8, h, h, h, C)

    fill_row = jnp.broadcast_to(
        jnp.asarray(fill, parent_blocks.dtype), (B, 1, h, h, h, C))
    table = jnp.concatenate([octs, fill_row], axis=1)

    cx, cy, cz = _decode_ids(child_bset.ids, nb * 2)
    pid = ((cx // 2) * nb + (cy // 2)) * nb + (cz // 2)
    pslot = jax.vmap(lambda s, i: jnp.take(s, i, axis=0, mode="clip"))(
        parent_bset.slot_of, pid)  # (B, MAXB_c), -1 if parent inactive
    olin = (cx % 2) * 4 + (cy % 2) * 2 + (cz % 2)
    row = pslot * 8 + olin
    row = jnp.where((pslot >= 0) & child_bset.valid, row, maxb_p * 8)
    return jax.vmap(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))(table, row)


def block_voxel_indices(bset: BlockSet) -> jnp.ndarray:
    """Linear voxel indices of every voxel in the active blocks.

    Returns (B, MAXB*bs³) int32 indices into the dim³ grid (x-major,
    matching ops/back_project._voxel_world_from_flat), padding slots
    pointing at block 0's voxels (mask with ``bset.valid``).
    """
    nb, bs = bset.nb, bset.bs
    d = nb * bs
    bx = bset.ids // (nb * nb)
    by = (bset.ids // nb) % nb
    bz = bset.ids % nb
    r = jnp.arange(bs)
    vx, vy, vz = jnp.meshgrid(r, r, r, indexing="ij")
    vx, vy, vz = vx.reshape(-1), vy.reshape(-1), vz.reshape(-1)  # (bs³,)
    gx = bx[..., None] * bs + vx
    gy = by[..., None] * bs + vy
    gz = bz[..., None] * bs + vz  # (B, MAXB, bs³)
    idx = (gx * d + gy) * d + gz
    return idx.reshape(idx.shape[0], -1).astype(jnp.int32)

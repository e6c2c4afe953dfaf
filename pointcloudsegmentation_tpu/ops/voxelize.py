"""Sort-based voxelization with static capacity.

TPU-native replacement for the reference's PoolingOps voxel machinery:
``ComputeVoxelIndex`` (floor((x - min)/voxel_len), ComputeVoxelIdx.cc:27-39),
``ComputePermutationInfo`` (48-bit key pack + thrust sort_by_key +
reduce_by_key, ComputePermutationInfo.cu:9-24,104-154), and
``ComputeVoxelLabel`` (majority vote, ComputeVoxelLabel.cu:5-60).

Instead of physically permuting points into voxel-contiguous order (which
forces the two-level re-permutation dance, ComputeRepermutationInfo.cu:20-90),
we compute a **segment id per point** via a stable argsort over packed voxel
keys and keep points in their original order.  Capacity is static: at most
``v_max`` distinct voxels are kept; points in voxels beyond the cap — and
invalid (padding) points — map to the overflow slot ``v_max``, which every
segment reduction drops.  Voxels are filled in spatial key order, so for any
realistic cap the overflow slot stays empty (tests assert occupancy).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

_INT32_MAX = jnp.iinfo(jnp.int32).max


class VoxelInfo(NamedTuple):
    """Result of voxelizing a padded point set.

    seg:     [N] int32 — voxel id per point in [0, v_max]; v_max = overflow.
    centers: [v_max, 3] float32 — mean xyz per voxel (0 where empty).
    counts:  [v_max] float32 — points per voxel.
    mask:    [v_max] bool — voxel occupied.
    """

    seg: jnp.ndarray
    centers: jnp.ndarray
    counts: jnp.ndarray
    mask: jnp.ndarray


def voxel_coords(xyz: jnp.ndarray, voxel_size: float,
                 block_size: float,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, int]:
    """Integer voxel coordinates.  The grid origin is the (masked) min
    corner of the point set — the reference derives it the same way
    (points_pooling subtracts the block min before ComputeVoxelIdx,
    ComputeVoxelIdx.cc:27-39).  A FIXED [-bs/2, bs/2] frame would clip
    every coordinate above bs/2 into the last cell: S3DIS-style blocks
    center xy but keep z in [0, bs], so half the block's height would
    voxel-merge vertically (and whole-scene callers with coords in
    [0, extent] would lose half of every axis).  ``block_size`` only
    sizes the static grid.

    The origin is QUANTIZED to the cell lattice (vs * floor(min/vs)), so
    cell walls sit at absolute multiples of voxel_size: adding or removing
    edge points (e.g. a different scene_shard halo) can only add/remove
    whole cells, never shift every cell boundary — voxel identities stay
    stable under changes to the point set's hull."""
    # ceil + slack + quant cell, capped at pack_keys' 10-bit key space —
    # with a min-corner origin the cap only merges points beyond 1024
    # cells (e.g. >150 m at 0.15 m voxels), never the block interior
    grid = min(int(-(-block_size // voxel_size)) + 2, 1 << 10)
    if mask is None:
        lo = jnp.min(xyz, axis=0)
    else:
        lo = jnp.min(jnp.where(mask[:, None], xyz, jnp.float32(3.4e38)),
                     axis=0)
    lo = voxel_size * jnp.floor(lo / voxel_size)
    lo = jax.lax.stop_gradient(lo)
    c = jnp.floor((xyz - lo[None, :]) / voxel_size).astype(jnp.int32)
    return jnp.clip(c, 0, grid - 1), grid


def pack_keys(coords: jnp.ndarray, grid: int) -> jnp.ndarray:
    """Pack [N,3] voxel coords into a sortable scalar key.

    Keys are MORTON (Z-order) codes, not the reference's lexicographic pack
    (ComputePermutationInfo.cu:9-24): any consistent key yields the same
    voxel partition, and Z-order makes the resulting voxel ranks spatially
    local — the coarser pyramid levels come out Morton-sorted for free,
    which the windowed search/conv fast path requires
    (ops.search.windowed_multi_band_neighbors).

    Class-pure keys (the ``ComputePermutationInfoWithClass`` variant,
    ComputePermutationInfo.cc:166-252) are NOT packed into one scalar:
    30 Morton bits * (C+1) overflows int32, and int64 silently truncates
    under JAX's default x64-disabled config.  Pass the label as ``key2`` to
    ``compute_segments`` instead (lexicographic two-key sort).
    """
    from .morton import morton_code

    assert grid <= 1024, grid
    return morton_code(coords)


def compute_segments(key: jnp.ndarray, mask: jnp.ndarray,
                     v_max: int,
                     key2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Map each point to a dense voxel slot via stable sort + unique-rank scan
    (the XLA analog of ComputePermutationInfo.cu:104-154's thrust pipeline).

    key:  [N] packed voxel keys.
    mask: [N] bool point validity.
    key2: optional [N] secondary key (e.g. class labels for class-pure
          voxels): points form a segment per distinct (key, key2) pair,
          with no overflow-prone scalar packing.
    Returns seg [N] int32 in [0, v_max]; invalid/overflow -> v_max.
    """
    key = jnp.where(mask, key, jnp.iinfo(key.dtype).max)
    if key2 is None:
        order = jnp.argsort(key)  # stable
        is_new_tail = None
    else:
        key2 = jnp.where(mask, key2.astype(jnp.int32), 0)
        # lexsort: last key is primary
        order = jnp.lexsort((key2, key))
        skey2 = key2[order]
        is_new_tail = skey2[1:] != skey2[:-1]
    skey = key[order]
    is_new = skey[1:] != skey[:-1]
    if is_new_tail is not None:
        is_new = is_new | is_new_tail
    is_new = jnp.concatenate([jnp.ones((1,), bool), is_new])
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    valid_sorted = mask[order]
    rank = jnp.where(valid_sorted & (rank < v_max), rank, v_max)
    seg = jnp.zeros_like(rank).at[order].set(rank)
    return seg


def voxelize(xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size: float,
             block_size: float, v_max: int) -> VoxelInfo:
    """Full voxelization: coords -> keys -> segments -> centers.

    Replaces the ComputeVoxelIndex -> ComputePermutationInfo ->
    PermutateFeature -> center/diff chain of ``points_pooling``
    (tf_ops/graph_pooling_layer.py:39-64) without any physical permutation.
    """
    from . import segments as seg_ops

    coords, grid = voxel_coords(xyz, voxel_size, block_size, mask)
    key = pack_keys(coords, grid)
    seg = compute_segments(key, mask, v_max)
    counts = seg_ops.segment_count(seg, v_max)
    centers = seg_ops.segment_sum(
        xyz * mask[:, None].astype(xyz.dtype), seg, v_max)
    centers = centers / jnp.maximum(counts[:, None], 1.0)
    return VoxelInfo(seg=seg, centers=centers, counts=counts,
                     mask=counts > 0)


def diff_to_center(xyz: jnp.ndarray, centers: jnp.ndarray,
                   seg: jnp.ndarray) -> jnp.ndarray:
    """Per-point offset from its voxel center (``ComputeDiffXyz``,
    ComputeDiffXYZ.cc:21-33).  Overflow/invalid points produce xyz - 0;
    callers mask.  Gradient flows only into xyz, matching the reference's
    explicitly-None gradient (tf_ops/graph_pooling_layer.py:16-18)."""
    from . import segments as seg_ops

    cen = seg_ops.segment_unpool(jnp.asarray(centers), seg)
    return xyz - jax.lax.stop_gradient(cen)


def voxel_majority_label(labels: jnp.ndarray, mask: jnp.ndarray,
                         seg: jnp.ndarray, v_max: int,
                         num_classes: int) -> jnp.ndarray:
    """Per-voxel majority-vote label (``ComputeVoxelLabel``,
    ComputeVoxelLabel.cu:5-60).  labels: [N] int -> [v_max] int32."""
    from . import segments as seg_ops

    onehot = jnp.where(
        mask[:, None],
        (labels[:, None] == jnp.arange(num_classes)[None, :]).astype(
            jnp.float32),
        0.0)
    votes = seg_ops.segment_sum(onehot, seg, v_max)
    return jnp.argmax(votes, axis=-1).astype(jnp.int32)


def voxelize_with_labels(xyz: jnp.ndarray, mask: jnp.ndarray,
                         labels: jnp.ndarray, voxel_size: float,
                         block_size: float, v_max: int,
                         num_classes: int) -> VoxelInfo:
    """Class-pure voxelization: the packed key includes the class label, so
    points of different classes never share a voxel
    (``ComputePermutationInfoWithClass`` / ``class_pooling``,
    ComputePermutationInfo.cc:166-252, tf_ops/graph_pooling_layer.py:230-257).
    """
    from . import segments as seg_ops

    del num_classes  # partition needs only label distinctness, not the count
    coords, grid = voxel_coords(xyz, voxel_size, block_size, mask)
    key = pack_keys(coords, grid)
    seg = compute_segments(key, mask, v_max, key2=labels)
    counts = seg_ops.segment_count(seg, v_max)
    centers = seg_ops.segment_sum(
        xyz * mask[:, None].astype(xyz.dtype), seg, v_max)
    centers = centers / jnp.maximum(counts[:, None], 1.0)
    return VoxelInfo(seg=seg, centers=centers, counts=counts,
                     mask=counts > 0)

"""Morton (Z-order) spatial sorting.

The windowed search/conv fast path (ops.search.windowed_multi_band_neighbors,
ops.neighbors windowed gathers) requires points whose spatial neighbors are
*index* neighbors: after sorting by Morton code, the K nearest neighbors of a
point fall inside a +-W index window for ~90% of edges (measured on
S3DIS-like blocks), and the remainder is routed through a small exact
overflow path.

The reference has no analog — its CUDA kernels gather arbitrary indices
(atomicAdd scatters, TFNeighborKernel.cu) and its voxel sort
(ComputePermutationInfo.cu:9-24) packs coords *lexicographically*, which has
poor locality in the minor axes.  On TPU, locality converts row-DMA gathers
into MXU-friendly windowed matmuls, so the sort pays for itself many times
over.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# 10 bits per axis -> 30-bit codes in int32 (grid up to 1024^3)
_BITS = 10


def _spread3(x: jnp.ndarray) -> jnp.ndarray:
    """Insert two zero bits between each of the low 10 bits (int32)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_code(coords: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] int cell coords (each < 1024) -> [N] int32 Z-order codes."""
    c = coords.astype(jnp.int32)
    return (_spread3(c[:, 0]) | (_spread3(c[:, 1]) << 1)
            | (_spread3(c[:, 2]) << 2))


def np_morton_code(coords: "np.ndarray") -> "np.ndarray":
    """Host-side (numpy) mirror of :func:`morton_code` for code that sizes
    or validates device selections on the host (e.g.
    parallel.scene_shard.geometric_required_halo) — must stay in sync with
    ``_BITS`` and the bit layout above.  (tests/oracles.py keeps its OWN
    independent implementation on purpose — it is the oracle.)"""
    import numpy as np

    def spread(x):
        x = x.astype(np.int64) & ((1 << _BITS) - 1)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return (spread(coords[:, 0]) | (spread(coords[:, 1]) << 1)
            | (spread(coords[:, 2]) << 2))


def morton_order(xyz: jnp.ndarray, mask: jnp.ndarray, cell: float,
                 block_size: float) -> jnp.ndarray:
    """Permutation sorting valid points by Morton code; padded (invalid)
    rows sort to the end.  The grid origin is the masked min corner
    (matching ops.voxelize.voxel_coords): a fixed [-bs/2, bs/2] frame
    would clip every coordinate above bs/2 into the last cell — S3DIS
    blocks keep z in [0, bs] and whole scenes live in [0, extent], so
    half of each such axis would sort as ONE cell (shards/windows then
    interleave spatially — the round-3 scene_shard plateau).

    Returns order [N] int32 such that x_sorted = x[order].

    If ``block_size / cell`` exceeds the 10-bit grid, the cell is COARSENED
    so the grid still covers the whole block: clipping instead would collapse
    every point past the covered range into one cell, making the "sort" the
    identity on large scenes (the scene_shard fidelity bug).
    """
    cell = max(float(cell), float(block_size) / (1 << _BITS))
    grid = min(int(-(-block_size // cell)) + 2, 1 << _BITS)
    lo = jnp.min(jnp.where(mask[:, None], xyz, jnp.float32(3.4e38)), axis=0)
    # lattice-quantized origin (see ops.voxelize.voxel_coords): edge-point
    # changes shift cell walls by whole cells only, keeping the sort stable
    lo = cell * jnp.floor(lo / cell)
    c = jnp.floor((xyz - lo[None, :]) / cell).astype(jnp.int32)
    c = jnp.clip(c, 0, grid - 1)
    key = morton_code(c)
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def inverse_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """inv such that x_sorted[inv] == x (for un-permuting model outputs)."""
    n = order.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    return inv


def sort_block(xyz: jnp.ndarray, mask: jnp.ndarray, cell: float,
               block_size: float,
               *arrays) -> Tuple:
    """Morton-sort a padded block: returns (xyz_s, mask_s, order, *arrays_s).

    ``arrays`` are additional per-point tensors (feats, labels, ...) permuted
    consistently.  Use ``inverse_permutation(order)`` to map per-point model
    outputs back to the input order.
    """
    order = morton_order(xyz, mask, cell, block_size)
    out = tuple(jnp.take(a, order, axis=0) for a in arrays)
    return (jnp.take(xyz, order, axis=0), jnp.take(mask, order, axis=0),
            order) + out

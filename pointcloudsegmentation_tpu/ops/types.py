"""Core static-shape data structures for irregular point clouds.

The reference framework represents a radius neighborhood as a CSR ragged
quadruple ``nidxs/nlens/nbegs/ncens`` (reference: tf_ops/TFNeighborScatter.cc:12-18)
with a *dynamic* edge count ``en``.  On TPU, dynamic shapes force recompilation
and defeat XLA tiling, so every neighborhood here is a padded fixed-degree
tensor.  The reference itself ships a fixed-K variant that pads by repeating
(tf_ops/SearchNeighborhoodFixed.cu:40-51), proving the models tolerate it —
we improve on it by keeping an explicit validity mask so means/maxes are
mask-correct rather than biased by repeated neighbors.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
from flax import struct


class Neighborhood(NamedTuple):
    """Fixed-degree neighborhood of N points with up to K neighbors each.

    idx:  [N, K] int32 — neighbor point indices; invalid slots point at the
          center itself (safe to gather) and are masked out.
    mask: [N, K] bool  — True where the slot holds a real neighbor.
    """

    idx: jnp.ndarray
    mask: jnp.ndarray

    @property
    def k(self) -> int:
        return self.idx.shape[-1]

    def counts(self) -> jnp.ndarray:
        """Per-point number of valid neighbors, float32 [N]."""
        return jnp.sum(self.mask.astype(jnp.float32), axis=-1)


@struct.dataclass
class WindowedNeighborhood:
    """Fixed-degree neighborhood split into a *windowed* fast path and a
    small exact *overflow* path (see ops.search.windowed_multi_band_neighbors).

    Requires the point set to be Morton-sorted (ops.morton.sort_block): for
    each tile of ``tile`` consecutive points, windowed neighbor slots index
    into the slab ``[t*tile - window, t*tile + tile + window)`` of the sorted
    order, so gathers become MXU one-hot matmuls over [tile, slab] blocks
    (8x faster fwd+bwd than row-DMA gathers, measured).  Neighbors outside
    the slab are carried as plain global indices in the overflow slots.

    lidx:    [N, K] int32 — slab-local neighbor indices in [0, tile+2*window)
    wmask:   [N, K] bool
    ov_idx:  [N, Ko] int32 — out-of-slab neighbors.  Three representations:
             with ``pool_idx`` set these are POSITIONS into the tile-shared
             overflow pool (invalid slots hold P, the one-hot null row);
             with ``ov_window > 0`` they are slab-local in the WIDER tier
             [t*tile - ov_window, t*tile + tile + ov_window); otherwise they
             are plain global indices (row-DMA gathers).
    ov_mask: [N, Ko] bool
    pool_idx: optional [nt, P] int32 — tile-shared overflow pool: the global
             point indices each tile's out-of-slab neighbors are drawn from
             (deduped across the tile's points, nearest-rank priority).  Per
             conv this costs ONE [nt*P]-row gather (~8x fewer rows than the
             N*Ko slot gather) after which per-point overflow reads are
             local one-hot matmuls over [P] — the windowed trick applied
             through one indirection.  Invalid pool entries hold 0 and are
             never referenced by a valid slot.
    window/tile/ov_window: STATIC pytree metadata (Python ints; a jit
    boundary keeps them static — they select the compiled slab geometry).

    The combined view (``mask``/``k``/``counts``/``global_idx``) presents the
    K + Ko slots as one neighborhood so masked reductions work unchanged.
    """

    lidx: jnp.ndarray
    wmask: jnp.ndarray
    ov_idx: jnp.ndarray
    ov_mask: jnp.ndarray
    window: int = struct.field(pytree_node=False)
    tile: int = struct.field(pytree_node=False)
    ov_window: int = struct.field(pytree_node=False, default=0)
    pool_idx: jnp.ndarray = None

    @property
    def k(self) -> int:
        return self.lidx.shape[-1] + self.ov_idx.shape[-1]

    @property
    def mask(self) -> jnp.ndarray:
        return jnp.concatenate([self.wmask, self.ov_mask], axis=-1)

    def counts(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.float32), axis=-1)

    @property
    def global_idx(self) -> jnp.ndarray:
        """[N, K+Ko] global indices (local slots converted)."""
        n = self.lidx.shape[0]
        tile_start = (jnp.arange(n, dtype=jnp.int32) // self.tile) * self.tile
        self_i = jnp.arange(n, dtype=jnp.int32)[:, None]
        gidx = self.lidx + (tile_start - self.window)[:, None]
        gidx = jnp.clip(gidx, 0, n - 1)
        gidx = jnp.where(self.wmask, gidx, self_i)
        ov = self.ov_idx
        if self.pool_idx is not None and ov.shape[-1] > 0:
            nt, p = self.pool_idx.shape
            ko = ov.shape[-1]
            pos = jnp.clip(ov.reshape(nt, -1), 0, p - 1)
            ov = jnp.take_along_axis(self.pool_idx, pos, axis=1)
            ov = ov.reshape(n, ko)
            ov = jnp.where(self.ov_mask, ov, self_i)
        elif self.ov_window > 0 and ov.shape[-1] > 0:
            ov = ov + (tile_start - self.ov_window)[:, None]
            ov = jnp.clip(ov, 0, n - 1)
            ov = jnp.where(self.ov_mask, ov, self_i)
        return jnp.concatenate([gidx, ov], axis=-1)

    def to_neighborhood(self) -> "Neighborhood":
        """Plain global-index view (for oracle tests / non-fast-path code)."""
        return Neighborhood(idx=self.global_idx, mask=self.mask)


class EdgeOverflow(NamedTuple):
    """Compact shared-capacity edge list for out-of-slab neighbors.

    Per-point overflow SLOTS waste ~8-16x capacity (avg overflow is ~0.5-1.5
    neighbors/point but the tail needs 8+ slots, and every conv pays a
    row-DMA gather+scatter over N*Ko slot rows).  Pooling the capacity into
    one [E]-edge list (E = edge_ratio*N across the level) serves the same
    tail with ~4x fewer gathered rows per conv and full overflow-pool
    recall.  Edges are sorted by center (row-major construction), so
    segment reductions run with indices_are_sorted=True.

    center: [E] int32 — center point index (sorted ascending).
    nbr:    [E] int32 — neighbor point index.
    sxyz:   [E, 3] float32 — xyz[nbr] - xyz[center].
    d2:     [E] float32 — squared edge length (for per-band membership).
    mask:   [E] bool — entry validity (contiguous prefix).

    Band membership is evaluated per use: ``(d2 >= mn²) & (d2 <= mx²) &
    mask`` — one shared list serves every band of the level.
    """

    center: jnp.ndarray
    nbr: jnp.ndarray
    sxyz: jnp.ndarray
    d2: jnp.ndarray
    mask: jnp.ndarray

    def band_mask(self, min_radius: float, max_radius: float) -> jnp.ndarray:
        return self.mask & (self.d2 >= min_radius * min_radius) \
            & (self.d2 <= max_radius * max_radius)


class Level(NamedTuple):
    """One level of the voxel pyramid: padded point set with validity mask."""

    xyz: jnp.ndarray   # [V, 3] float32; zeros where invalid
    mask: jnp.ndarray  # [V] bool


@struct.dataclass
class Pyramid:
    """Static-shape voxel pooling hierarchy.

    TPU-native equivalent of the reference's in-graph
    ``points_pooling_two_layers`` (tf_ops/graph_pooling_layer.py:110-146),
    which physically sorts points by voxel key and re-permutes the fine level
    after the coarse sort (ComputeRepermutationInfo).  Here points are never
    reordered; each level carries a segment-id map into the next level, so
    voxel pool/unpool are plain ``segment_*`` / gather ops.

    levels: tuple of ``Level`` — levels[0] is the input point set.
    seg:    tuple of int32 arrays; seg[i] has shape [V_i] and maps each point
            of level i to its voxel in level i+1, with value V_{i+1}
            (the overflow slot) for invalid/overflowed points.
    dxyz:   tuple of [V_i, 3] arrays; xyz minus the containing voxel center
            (the reference's ``dpts``, ComputeDiffXYZ.cc:21-33), zeros where
            invalid.  Raw (un-normalized) — models divide by voxel size.
    morton_sorted: STATIC — True iff level 0 (the input points) is
            Morton-sorted; the caller of build_pyramid asserts this.  The
            windowed search fast path requires it (ops.search).  Levels >= 1
            are ALWAYS Morton-sorted by construction: compute_segments ranks
            voxels by Morton key order regardless of the input order — use
            ``level_sorted(i)``.
    """

    levels: Tuple[Level, ...]
    seg: Tuple[jnp.ndarray, ...]
    dxyz: Tuple[jnp.ndarray, ...]
    morton_sorted: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def level_sorted(self, i: int) -> bool:
        """Whether level i's points are in Morton order (windowed-search
        eligibility)."""
        return True if i >= 1 else self.morton_sorted

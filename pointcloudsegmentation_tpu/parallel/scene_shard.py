"""Scene parallelism: shard ONE huge point cloud across devices with halo
exchange for cross-boundary neighborhoods.

The reference scales to multi-hectare scenes purely by *spatial
decomposition on the host* (80 m -> 10 m/3 m blocks with stride overlap,
semantic3d_util.py:136-178; context branches for long-range signal) and
never shards a single scene across accelerators (SURVEY §2.10/§5).  This
module is the TPU-native analog of context/ring parallelism for
point clouds:

- the scene is Morton-sorted once (ops.morton), so a contiguous index
  range is a compact spatial region;
- each device takes one contiguous shard plus a HALO of the neighboring
  shards' edge points, exchanged over ICI with ``jax.lax.ppermute``
  (the ring-exchange collective) inside ``shard_map``;
- every device runs the same per-block model on [halo | core | halo] with
  coordinates re-centered per shard (the same local-frame trick as the
  reference's block pipeline), and keeps logits for its core points.

Fidelity contract: points whose neighborhood cone stays within the halo
see exactly the single-device result; points near shard boundaries see a
cropped receptive field — the same tradeoff as the reference's block
decomposition, but on-device and with the cut placed by the space-filling
curve instead of a fixed grid.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import morton


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """[L, ...] per-device shard -> [halo + L + halo, ...] with the right
    edge of the left neighbor and the left edge of the right neighbor
    (ring ppermute over ICI).  The ends of the ring receive wrapped data —
    callers mask it via ``halo_validity``."""
    n = jax.lax.psum(1, axis_name)
    right_edge = x[-halo:]
    left_edge = x[:halo]
    from_left = jax.lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n) for i in range(n)])
    return jnp.concatenate([from_left, x, from_right], axis=0)


def halo_validity(mask_ext: jnp.ndarray, halo: int,
                  axis_name: str) -> jnp.ndarray:
    """Invalidate the wrapped halo at the ends of the (non-cyclic) scene:
    shard 0 has no real left neighbor, the last shard no right one."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    pos = jnp.arange(mask_ext.shape[0])
    left_ok = (idx > 0) | (pos >= halo)
    right_ok = (idx < n - 1) | (pos < mask_ext.shape[0] - halo)
    return mask_ext & left_ok & right_ok


def scene_apply(apply_fn: Callable, params, xyz: jnp.ndarray,
                feats: jnp.ndarray, mask: jnp.ndarray, mesh: Mesh,
                halo: int, sort_cell: float = 0.05,
                scene_extent: float = 1024.0,
                axis_name: str = "data") -> jnp.ndarray:
    """Run a per-block model over ONE scene sharded across the mesh.

    apply_fn(params, xyz, feats, mask) -> [n, C] per-point logits (the
    SegmentationModel contract); it sees [halo + L + halo] points in a
    shard-centered frame.  Returns [N, C] logits in the input point order.

    xyz/feats/mask: [N, ...] with N divisible by mesh.size; halo < N/size.
    ``scene_extent``: bound on scene coordinates for the Morton sort.
    """
    n = xyz.shape[0]
    d = mesh.size
    assert n % d == 0 and 0 < halo <= n // d, (n, d, halo)

    # global Morton sort -> contiguous shards are compact regions
    xyz_s, mask_s, order, feats_s = morton.sort_block(
        xyz, mask, sort_cell, scene_extent, feats)
    inv = morton.inverse_permutation(order)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
             out_specs=P(axis_name))
    def run(p, x, f, m):
        x = halo_exchange(x, halo, axis_name)
        f = halo_exchange(f, halo, axis_name)
        m = halo_exchange(m, halo, axis_name)
        m = halo_validity(m, halo, axis_name)
        # shard-local frame: the per-block models assume coordinates within
        # +-block_size/2 of the origin (ops.voxelize grids)
        center = jnp.sum(jnp.where(m[:, None], x, 0.0), axis=0) \
            / jnp.maximum(jnp.sum(m.astype(x.dtype)), 1.0)
        logits = apply_fn(p, x - center[None, :], f, m)
        return logits[halo:-halo]                     # core points only

    logits_s = run(params, xyz_s, feats_s, mask_s)
    return jnp.take(logits_s, inv, axis=0)

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


def model_receptive_field(arch) -> float:
    """Conservative receptive-field bound of a spec-driven pointnet Arch in
    METERS: each conv dilates the field by its search radius (neighbor
    features flow one radius per conv); voxel pooling keeps positions
    within the voxel, absorbed by the per-stage radii.  Use as the
    ``receptive_field`` input to the halo check in :func:`scene_apply`."""
    return float(sum(c.radius for st in arch.stages for c in st.convs))


def required_halo(xyz_sorted: "np.ndarray", mask: "np.ndarray",
                  n_shards: int, receptive_field: float,
                  percentile: float = 100.0) -> int:
    """Data-driven halo requirement for a Morton-sorted scene.

    For every point, find its neighbors within ``receptive_field`` meters;
    a neighbor that lies in a different shard demands halo >= its index
    reach past the shard boundary.  Returns the ``percentile`` of those
    demands (100 = exact guarantee; Morton discontinuities make the worst
    case fat-tailed — 99.x trades a handful of cropped cones for a much
    smaller halo; the study in scripts/halo_study.py quantifies it).

    Host-side helper (numpy/scipy) — run once per scene before
    :func:`scene_apply`, on the SORTED coordinates (ops.morton.sort_block
    with the same sort_cell/scene_extent).
    """
    import numpy as np
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz_sorted, np.float32)
    m = np.asarray(mask, bool)
    n = len(xyz)
    L = n // n_shards
    valid_idx = np.nonzero(m)[0]
    tree = cKDTree(xyz[valid_idx])
    pairs = tree.query_pairs(receptive_field, output_type="ndarray")
    if len(pairs) == 0:
        return 1
    i = valid_idx[pairs[:, 0]]
    j = valid_idx[pairs[:, 1]]
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    cross = (lo // L) != (hi // L)
    if not cross.any():
        return 1
    lo, hi = lo[cross], hi[cross]
    # demand of the hi-side point reaching back past its shard start, and
    # of the lo-side point reaching forward past its shard end
    back = (hi // L) * L - lo
    fwd = hi - ((lo // L) * L + L - 1)
    demands = np.concatenate([back, fwd])
    return int(np.percentile(demands, percentile)) + 1


def scene_apply(apply_fn: Callable, params, xyz: jnp.ndarray,
                feats: jnp.ndarray, mask: jnp.ndarray, mesh: Mesh,
                halo: int, sort_cell: float = 0.05,
                scene_extent: float = 1024.0,
                axis_name: str = "data",
                receptive_field: float = 0.0,
                halo_percentile: float = 99.9) -> jnp.ndarray:
    """Run a per-block model over ONE scene sharded across the mesh.

    apply_fn(params, xyz, feats, mask) -> [n, C] per-point logits (the
    SegmentationModel contract); it sees [halo + L + halo] points in a
    shard-centered frame.  Returns [N, C] logits in the input point order.

    xyz/feats/mask: [N, ...] with N divisible by mesh.size; halo < N/size.
    ``scene_extent``: bound on scene coordinates for the Morton sort.

    ``receptive_field`` (meters, optional): when > 0, the halo is checked
    against the data-driven requirement (:func:`required_halo` at
    ``halo_percentile``) on the sorted scene and a ValueError names the
    needed size — derive the field from the model with
    :func:`model_receptive_field`.  The check runs on the host once per
    scene (one KD-tree pass).
    """
    n = xyz.shape[0]
    d = mesh.size
    assert n % d == 0 and 0 < halo <= n // d, (n, d, halo)

    # global Morton sort -> contiguous shards are compact regions
    xyz_s, mask_s, order, feats_s = morton.sort_block(
        xyz, mask, sort_cell, scene_extent, feats)
    inv = morton.inverse_permutation(order)

    if receptive_field > 0.0:
        import numpy as np

        need = required_halo(np.asarray(xyz_s), np.asarray(mask_s), d,
                             receptive_field, percentile=halo_percentile)
        if halo < need:
            raise ValueError(
                f"halo={halo} is below the data-driven requirement "
                f"{need} (receptive_field={receptive_field} m at the "
                f"{halo_percentile} percentile over {d} shards) — "
                "boundary points would see cropped neighborhood cones; "
                "raise halo or shard over fewer devices")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
             out_specs=P(axis_name))
    def run(p, x, f, m):
        # shard-local frame: the per-block models assume coordinates within
        # +-block_size/2 of the origin (ops.voxelize grids).  The center is
        # computed over CORE points only, so the frame — and with it the
        # voxel grid placement — is invariant to the halo size (a
        # halo-dependent frame would shift every logit when the halo
        # changes, masking the true truncation error; scripts/halo_study.py)
        center = jnp.sum(jnp.where(m[:, None], x, 0.0), axis=0) \
            / jnp.maximum(jnp.sum(m.astype(x.dtype)), 1.0)
        x = halo_exchange(x, halo, axis_name)
        f = halo_exchange(f, halo, axis_name)
        m = halo_exchange(m, halo, axis_name)
        m = halo_validity(m, halo, axis_name)
        logits = apply_fn(p, x - center[None, :], f, m)
        return logits[halo:-halo]                     # core points only

    logits_s = run(params, xyz_s, feats_s, mask_s)
    return jnp.take(logits_s, inv, axis=0)

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
- each device takes one contiguous shard plus a HALO of neighbor-shard
  points, exchanged over ICI with ``jax.lax.ppermute`` (the ring-exchange
  collective) inside ``shard_map``;
- the halo is selected GEOMETRICALLY by default (``halo_mode="geom"``):
  each device ships its ``halo`` points nearest to the neighbor's
  bounding box, so the buffer is sized by boundary-band content.  The
  raw index-edge exchange (``halo_mode="index"``) is kept for
  comparison, but inherits the Morton curve's fat tail — a boundary
  point's metric neighbors can sit anywhere in the adjacent octant's
  index range, so corridor scenes demand index halos ~N/shards
  (measured: scripts/halo_study.py);
- every device runs the same per-block model on [halo | core | halo] with
  coordinates re-centered per shard (the same local-frame trick as the
  reference's block pipeline), and keeps logits for its core points.

Fidelity contract: points whose neighborhood cone stays within the
halo'd geometry see (near-)single-device results; points whose cone
spans NON-adjacent shards are cropped in either mode
(``geometric_required_halo`` reports them).  The same tradeoff as the
reference's block decomposition, but on-device and with the cut placed
by the space-filling curve instead of a fixed grid.
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


def geometric_halo_exchange(x: jnp.ndarray, f: jnp.ndarray, m: jnp.ndarray,
                            halo: int, axis_name: str,
                            num_probes: int = 64,
                            cell_size: float = 0.0):
    """[L, ...] per-device shard -> ([halo+L+halo, ...] x, f, mask) where
    each halo block holds the neighbor's ``halo`` points GEOMETRICALLY
    nearest to this shard — not its index-adjacent edge.

    Index halos inherit the Morton curve's fat tail: a boundary point's
    metric neighbors can sit anywhere in the adjacent octant's index range
    (index demand ~N/shards on corridor scenes — scripts/halo_study.py),
    so small index halos crop receptive cones no matter the geometry.
    Selecting by distance instead captures exactly the boundary-band
    content: each device ppermutes a ``num_probes``-point strided sample
    of its core to both ring neighbors, ranks its own points by min
    distance to the neighbor's probes (one [L, P] distance pass + argsort),
    and ships the top ``halo`` rows.  Probes — not the neighbor's AABB:
    adjacent Morton shards' boxes overlap (shards rarely align with octant
    boundaries), which puts many sender points at box-distance 0 and makes
    the selection arbitrary among ties; distance to a sample of the actual
    core has no such degeneracy.  The exchange volume and layout match
    :func:`halo_exchange`; only the selection differs.

    ``cell_size`` > 0 ships whole LATTICE CELLS instead of individual
    points: every point is ranked by its cell center's probe distance and
    tie-broken by cell key, so cells arrive intact in relevance order
    (only the budget-frontier cell can be cut).  Pass the model's coarsest
    voxel size — point-wise selection would partially fill the receiver's
    voxels, making their pooled features diverge from the full-halo result
    even when all receptive-cone geometry is present (ops.voxelize places
    cell walls on the absolute voxel_size lattice, so sender and receiver
    agree on cell identity).

    Ring ends receive wrapped packages — invalidated here (the returned
    mask already accounts for it; do NOT reapply :func:`halo_validity`).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    big = jnp.float32(3.4e38)
    L = x.shape[0]
    p = min(num_probes, L)

    # strided sample of the (Morton-sorted) core: spatially spread probes;
    # invalid rows become unreachable probes
    stride = max(L // p, 1)
    probe_rows = jnp.arange(p, dtype=jnp.int32) * stride
    probes = jnp.take(x, probe_rows, axis=0)                     # [p, 3]
    probes_ok = jnp.take(m, probe_rows, axis=0)
    probes = jnp.where(probes_ok[:, None], probes, big)

    to_left = [(i, (i - 1) % n) for i in range(n)]
    to_right = [(i, (i + 1) % n) for i in range(n)]
    probes_of_right = jax.lax.ppermute(probes, axis_name, to_left)
    probes_of_left = jax.lax.ppermute(probes, axis_name, to_right)

    if cell_size > 0.0:
        from ..ops.morton import morton_code

        cc = jnp.floor(x / cell_size)
        rank_pos = cc * cell_size + 0.5 * cell_size   # cell centers
        cell_key = morton_code(jnp.clip(cc - jnp.min(
            jnp.where(m[:, None], cc, 3.4e38), axis=0)[None, :],
            0, 1023).astype(jnp.int32))
    else:
        rank_pos = x
        cell_key = None

    def _package(nbr_probes):
        d2 = jnp.sum((rank_pos[:, None, :] - nbr_probes[None, :, :]) ** 2,
                     axis=-1)                                    # [L, p]
        dist = jnp.sqrt(jnp.min(d2, axis=1))
        pri = jnp.where(m, dist, big)
        if cell_key is None:
            sel = jnp.argsort(pri)[:halo]
        else:
            # whole cells in relevance order: primary = cell distance
            # (identical within a cell), secondary = cell key
            sel = jnp.lexsort((cell_key, pri))[:halo]
        ok = jnp.take(pri, sel) < big
        return (jnp.take(x, sel, axis=0), jnp.take(f, sel, axis=0), ok)

    pkg_r = _package(probes_of_right)   # what I contribute to my right nbr
    pkg_l = _package(probes_of_left)
    from_left = tuple(jax.lax.ppermute(t, axis_name, to_right)
                      for t in pkg_r)
    from_right = tuple(jax.lax.ppermute(t, axis_name, to_left)
                       for t in pkg_l)
    # non-cyclic scene: the wrap-around packages are not real neighbors
    fl_ok = from_left[2] & (idx > 0)
    fr_ok = from_right[2] & (idx < n - 1)
    cat = lambda a, b, c: jnp.concatenate([a, b, c], axis=0)
    return (cat(from_left[0], x, from_right[0]),
            cat(from_left[1], f, from_right[1]),
            cat(fl_ok, m, fr_ok))


def model_receptive_field(arch) -> float:
    """Conservative receptive-field bound of a spec-driven pointnet Arch in
    METERS: each conv dilates the field by its search radius (neighbor
    features flow one radius per conv); voxel pooling keeps positions
    within the voxel, absorbed by the per-stage radii.  Use as the
    ``receptive_field`` input to the halo check in :func:`scene_apply`."""
    return float(sum(c.radius for st in arch.stages for c in st.convs))


def _neighbor_pairs(xyz_sorted, mask, receptive_field):
    """(xyz f32, mask bool, pi, pj) with pi/pj absolute row indices of every
    valid point pair within ``receptive_field`` meters (one KD-tree pass —
    shared by :func:`required_halo` / :func:`geometric_required_halo`)."""
    import numpy as np
    from scipy.spatial import cKDTree

    xyz = np.asarray(xyz_sorted, np.float32)
    m = np.asarray(mask, bool)
    valid_idx = np.nonzero(m)[0]
    tree = cKDTree(xyz[valid_idx])
    pairs = tree.query_pairs(receptive_field, output_type="ndarray")
    return xyz, m, valid_idx[pairs[:, 0]], valid_idx[pairs[:, 1]]


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

    xyz, m, i, j = _neighbor_pairs(xyz_sorted, mask, receptive_field)
    L = len(xyz) // n_shards
    if len(i) == 0:
        return 1
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


def geometric_required_halo(xyz_sorted: "np.ndarray", mask: "np.ndarray",
                            n_shards: int, receptive_field: float,
                            num_probes: int = 64,
                            cell_size: float = 0.0) -> tuple:
    """Data-driven buffer size for ``halo_mode="geom"``.

    Returns ``(need, unreachable)``: ``need`` is the smallest halo for
    which :func:`geometric_halo_exchange`'s selection (mirrored here —
    same probes, same priority, same tie-breaking) ships every sender
    point within ``receptive_field`` of any receiver point, maximized
    over directed adjacent shard pairs.  Mirroring matters: the device
    ranks by distance to a PROBE SAMPLE of the receiver's core, which
    overestimates the true core distance by up to the probe spacing, so
    a count of truly-needed points alone would undersize the buffer.
    ``unreachable`` counts cross-shard neighbor pairs spanning
    NON-adjacent shards, which a one-hop ring exchange cannot serve in
    either mode (0 on scenes whose Morton shards touch only their curve
    neighbors).  Pass the same ``num_probes``/``cell_size`` as the
    exchange.
    """
    import numpy as np

    xyz, m, pi, pj = _neighbor_pairs(xyz_sorted, mask, receptive_field)
    L = len(xyz) // n_shards
    if len(pi) == 0:
        return 1, 0
    i = pi // L
    j = pj // L
    cross = i != j
    unreachable = int((np.abs(i - j)[cross] > 1).sum())

    p = min(num_probes, L)
    stride = max(L // p, 1)

    def shard_probes(r):
        rows = r * L + np.arange(p) * stride
        pr = xyz[rows]
        return pr[m[rows]]

    def rank_of_needed(s, r, needed_idx):
        """Buffer size the device selection needs to include every
        ``needed_idx`` sender row (absolute indices in shard s)."""
        rows = np.arange(s * L, (s + 1) * L)
        pr = shard_probes(r)
        if len(pr) == 0 or len(needed_idx) == 0:
            return 1
        pos = xyz[rows]
        if cell_size > 0.0:
            cc = np.floor(pos / cell_size)
            pos = cc * cell_size + 0.5 * cell_size
        dist = np.sqrt(((pos[:, None, :] - pr[None, :, :]) ** 2
                        ).sum(-1)).min(1)
        pri = np.where(m[rows], dist, np.float32(3.4e38))
        if cell_size > 0.0:
            cc_i = np.clip(cc - cc[m[rows]].min(0), 0, 1023).astype(np.int64)
            ckey = morton.np_morton_code(cc_i)
            order = np.lexsort((ckey, pri))
        else:
            order = np.argsort(pri, kind="stable")
        rank = np.empty(L, np.int64)
        rank[order] = np.arange(L)
        return int(rank[needed_idx - s * L].max()) + 1

    need = 1
    for (a, b) in {(int(s), int(r)) for s, r in
                   zip(np.minimum(i, j), np.maximum(i, j)) if r == s + 1}:
        sel = ((i == a) & (j == b)) | ((i == b) & (j == a))
        lo = np.unique(np.minimum(pi[sel], pj[sel]))   # senders in shard a
        hi = np.unique(np.maximum(pi[sel], pj[sel]))   # senders in shard b
        need = max(need, rank_of_needed(a, b, lo), rank_of_needed(b, a, hi))
    return need, unreachable


def scene_apply(apply_fn: Callable, params, xyz: jnp.ndarray,
                feats: jnp.ndarray, mask: jnp.ndarray, mesh: Mesh,
                halo: int, sort_cell: float = 0.05,
                scene_extent: float = 1024.0,
                axis_name: str = "data",
                receptive_field: float = 0.0,
                halo_percentile: float = 99.9,
                halo_mode: str = "geom",
                halo_cell: float = 0.0) -> jnp.ndarray:
    """Run a per-block model over ONE scene sharded across the mesh.

    apply_fn(params, xyz, feats, mask) -> [n, C] per-point logits (the
    SegmentationModel contract); it sees [halo + L + halo] points in a
    shard-centered frame.  Returns [N, C] logits in the input point order.

    xyz/feats/mask: [N, ...] with N divisible by mesh.size; halo < N/size.
    ``scene_extent``: bound on scene coordinates for the Morton sort.

    ``halo_mode``: "geom" (default) ships each neighbor's ``halo``
    geometrically-nearest points (:func:`geometric_halo_exchange` — buffer
    sized by boundary-band content, immune to Morton index jumps); "index"
    ships the raw index-adjacent edges (:func:`halo_exchange` — cheaper
    selection, but corridor scenes demand index halos ~N/shards,
    scripts/halo_study.py).  ``halo_cell``: pass the model's coarsest
    voxel size to make geom selection ship whole lattice cells (best
    fidelity — see :func:`geometric_halo_exchange`).

    ``receptive_field`` (meters, optional): when > 0, the halo is checked
    against the data-driven requirement (:func:`geometric_required_halo`
    resp. :func:`required_halo` at ``halo_percentile``) on the sorted
    scene and a ValueError names the needed size — derive the field from
    the model with :func:`model_receptive_field`.  The check runs on the
    host once per scene (one KD-tree pass); in geom mode the same field
    also bounds the shipped geometry on device.
    """
    n = xyz.shape[0]
    d = mesh.size
    assert n % d == 0 and 0 < halo <= n // d, (n, d, halo)
    assert halo_mode in ("geom", "index"), halo_mode

    # global Morton sort -> contiguous shards are compact regions
    xyz_s, mask_s, order, feats_s = morton.sort_block(
        xyz, mask, sort_cell, scene_extent, feats)
    inv = morton.inverse_permutation(order)

    if receptive_field > 0.0:
        import numpy as np

        if halo_mode == "geom":
            # mirror the EXACT on-device selection (same cell grouping)
            need, unreachable = geometric_required_halo(
                np.asarray(xyz_s), np.asarray(mask_s), d, receptive_field,
                cell_size=halo_cell)
            if unreachable:
                from ..utils.logging import get_logger
                get_logger("scene_shard").warning(
                    "%d neighbor pairs span NON-adjacent shards and cannot "
                    "be served by the one-hop ring exchange (any halo) — "
                    "their receptive cones are cropped; shard over fewer "
                    "devices or accept block-decomposition fidelity there",
                    unreachable)
        else:
            need = required_halo(np.asarray(xyz_s), np.asarray(mask_s), d,
                                 receptive_field,
                                 percentile=halo_percentile)
        if halo < need:
            raise ValueError(
                f"halo={halo} is below the data-driven requirement "
                f"{need} (halo_mode={halo_mode}, "
                f"receptive_field={receptive_field} m over {d} shards) — "
                "boundary points would see cropped neighborhood cones; "
                "raise halo or shard over fewer devices")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
             out_specs=P(axis_name))
    def run(p, x, f, m):
        # shard-local frame: the per-block models assume block-scale
        # coordinate spans (ops.voxelize grids size by block_size; the
        # origin itself is data-derived).  The center is
        # computed over CORE points only, so the frame — and with it the
        # voxel grid placement — is invariant to the halo size (a
        # halo-dependent frame would shift every logit when the halo
        # changes, masking the true truncation error; scripts/halo_study.py)
        center = jnp.sum(jnp.where(m[:, None], x, 0.0), axis=0) \
            / jnp.maximum(jnp.sum(m.astype(x.dtype)), 1.0)
        if halo_cell > 0.0:
            # quantize the frame shift to the halo_cell lattice (still
            # core-derived, still halo-invariant): the model's voxel walls
            # then sit on absolute cell_size multiples in SCENE frame,
            # matching the sender's cell binning — an un-quantized center
            # would offset every wall by (center mod halo_cell) and shipped
            # "whole cells" would straddle two model voxels
            center = halo_cell * jnp.floor(center / halo_cell)
        if halo_mode == "geom":
            x, f, m = geometric_halo_exchange(x, f, m, halo, axis_name,
                                              cell_size=halo_cell)
        else:
            x = halo_exchange(x, halo, axis_name)
            f = halo_exchange(f, halo, axis_name)
            m = halo_exchange(m, halo, axis_name)
            m = halo_validity(m, halo, axis_name)
        logits = apply_fn(p, x - center[None, :], f, m)
        return logits[halo:-halo]                     # core points only

    logits_s = run(params, xyz_s, feats_s, mask_s)
    return jnp.take(logits_s, inv, axis=0)

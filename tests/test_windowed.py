"""Tests for Morton sorting and the windowed search/gather fast path
(ops.morton, ops.search.windowed_multi_band_neighbors,
ops.neighbors.windowed_gather).

The fast path must be *behavior-preserving*: the one-hot windowed gather is
bit-exact vs a plain row gather on the global-index view, and the windowed +
overflow union recalls the oracle neighborhoods as well as the global path.
(On CPU, approx_max_k lowers to exact top_k, so recall here is the
pool-capacity bound; TPU recall_target effects are measured separately in
scripts/microbench.py / recall experiments.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracles import np_morton3, np_radius_neighbors, random_cloud
from pointcloudsegmentation_tpu.ops import morton
from pointcloudsegmentation_tpu.ops import neighbors as nb
from pointcloudsegmentation_tpu.ops import search
from pointcloudsegmentation_tpu.ops.types import WindowedNeighborhood

BANDS = ((0.0, 0.4, 16), (0.4, 0.6, 12), (0.0, 0.25, 8))


def _sorted_cloud(rng, n=1024, n_valid=None):
    xyz, mask = random_cloud(rng, n, n_valid=n_valid)
    xs, ms, order = morton.sort_block(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, 3.0)
    return np.asarray(xs), np.asarray(ms), order


def test_morton_code_matches_oracle(rng):
    c = rng.randint(0, 1024, (256, 3)).astype(np.int32)
    got = np.asarray(morton.morton_code(jnp.asarray(c)))
    np.testing.assert_array_equal(got, np_morton3(c).astype(np.int32))


def test_sort_block_permutation(rng):
    xyz, mask = random_cloud(rng, 300, n_valid=250)
    feats = rng.randn(300, 5).astype(np.float32)
    xs, ms, order, fs = morton.sort_block(
        jnp.asarray(xyz), jnp.asarray(mask), 0.1, 3.0, jnp.asarray(feats))
    order = np.asarray(order)
    assert sorted(order.tolist()) == list(range(300))  # a permutation
    np.testing.assert_array_equal(np.asarray(xs), xyz[order])
    np.testing.assert_array_equal(np.asarray(fs), feats[order])
    # invalid rows sort to the end
    assert not np.asarray(ms)[250:].any() or np.asarray(ms).sum() == 250
    assert np.asarray(ms)[:int(mask.sum())].all()
    # Morton keys of valid rows are nondecreasing
    grid_c = np.clip(np.floor((np.asarray(xs) + 1.5) / 0.1), 0,
                     1023).astype(np.int64)
    keys = np_morton3(grid_c)[np.asarray(ms)]
    assert (np.diff(keys) >= 0).all()
    # inverse permutation round-trips
    inv = np.asarray(morton.inverse_permutation(order))
    np.testing.assert_array_equal(np.asarray(xs)[inv], xyz)


def test_windowed_gather_bitexact_vs_take(rng):
    xyz, mask, _ = _sorted_cloud(rng, 1024, n_valid=980)
    res = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=48, ov_slots=6)
    feats = jnp.asarray(rng.randn(1024, 24).astype(np.float32))
    for wn in res:
        assert isinstance(wn, WindowedNeighborhood)
        got = nb.gather_neighbors(feats, wn)
        want = jnp.take(feats, wn.global_idx, axis=0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_windowed_gather_grads_match_take(rng):
    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=500)
    (wn,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.4, 12),), tile=128,
        window=128, cand_k=32, ov_slots=4)
    feats = jnp.asarray(rng.randn(512, 8).astype(np.float32))
    cot = jnp.asarray(rng.randn(512, wn.k, 8).astype(np.float32))

    g_fast = jax.vjp(lambda f: nb.gather_neighbors(f, wn), feats)[1](cot)[0]
    g_ref = jax.vjp(lambda f: jnp.take(f, wn.global_idx, axis=0),
                    feats)[1](cot)[0]
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_windowed_union_recall_matches_oracle(rng):
    """The windowed+overflow union must recall the oracle neighborhoods as
    well as the production global path (pool-capacity bound on CPU)."""
    xyz, mask, _ = _sorted_cloud(rng, 1024, n_valid=1000)
    res = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=64, ov_slots=12)
    for (mn, mx, k), wn in zip(BANDS, res):
        oracle_idx, oracle_mask = np_radius_neighbors(xyz, mask, mx, k,
                                                      min_radius=mn)
        g = np.asarray(wn.global_idx)
        m = np.asarray(wn.mask)
        tot = hit = 0
        for i in range(1024):
            if not mask[i]:
                assert not m[i].any()
                continue
            true = set(oracle_idx[i][oracle_mask[i]].tolist())
            got = set(g[i][m[i]].tolist())
            tot += len(true)
            hit += len(true & got)
            # no false positives: everything returned is a true neighbor
            extra = got - true
            for j in extra:
                d = np.linalg.norm(xyz[j] - xyz[i])
                # only admissible when the band is over-full (true set was
                # truncated to k nearest); then the extra must be in-band
                assert mn <= d <= mx + 1e-6, (i, j, d)
        assert hit / max(tot, 1) >= 0.995, (mn, mx, k, hit / tot)


def test_slab_selection_dominates_global_selection(rng):
    """sel_mode='slab' (per-tile slab top-k + out-of-slab-only global pass)
    selects from candidate pools that are SUPERSETS of the global
    selection's (the slab pass ranks against all S slab columns, the
    overflow pass against all out-of-slab columns, instead of whatever
    survived one global cand_k cut) — so with no tile-pool cap, every row
    must have at least as many neighbors, each at most as far (CPU lowers
    approx_max_k to exact, making the domination deterministic)."""
    xyz, mask, _ = _sorted_cloud(rng, 2048, n_valid=2000)
    res = {mode: search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=256, window=256,
        cand_k=64, ov_slots=12, sel_mode=mode)
        for mode in ("global", "slab")}
    for (mn, mx, k), wg, ws in zip(BANDS, res["global"], res["slab"]):
        for wn in (wg, ws):
            assert isinstance(wn, WindowedNeighborhood)
        gg, gm = np.asarray(wg.global_idx), np.asarray(wg.mask)
        sg, sm_ = np.asarray(ws.global_idx), np.asarray(ws.mask)
        assert (sm_.sum(1) >= gm.sum(1)).all(), (mn, mx)
        for i in range(0, 2048, 7):
            dg = np.sort(np.linalg.norm(xyz[gg[i][gm[i]]] - xyz[i], axis=1))
            ds = np.sort(np.linalg.norm(xyz[sg[i][sm_[i]]] - xyz[i], axis=1))
            assert (ds[:len(dg)] <= dg + 1e-6).all(), (mn, mx, i)


@pytest.mark.parametrize("sel_mode", ["global", "slab"])
def test_windowed_union_recall_by_sel_mode(rng, sel_mode):
    """Oracle recall of the windowed+overflow union under each selection
    strategy (pool-capacity bound on CPU; no false positives)."""
    xyz, mask, _ = _sorted_cloud(rng, 1024, n_valid=1000)
    res = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=64, ov_slots=12, sel_mode=sel_mode)
    for (mn, mx, k), wn in zip(BANDS, res):
        oracle_idx, oracle_mask = np_radius_neighbors(xyz, mask, mx, k,
                                                      min_radius=mn)
        g = np.asarray(wn.global_idx)
        m = np.asarray(wn.mask)
        tot = hit = 0
        for i in range(1024):
            if not mask[i]:
                continue
            true = set(oracle_idx[i][oracle_mask[i]].tolist())
            got = set(g[i][m[i]].tolist())
            tot += len(true)
            hit += len(true & got)
            for j in got - true:
                d = np.linalg.norm(xyz[j] - xyz[i])
                assert mn <= d <= mx + 1e-6, (i, j, d)
        assert hit / max(tot, 1) >= 0.995, (mn, mx, k, hit / tot)


def test_windowed_matches_global_path_through_conv(rng):
    """A conv layer fed a WindowedNeighborhood must produce the same output
    as the same layer fed the equivalent plain Neighborhood."""
    from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast

    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=512)
    (pair,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.4, 12),), tile=128,
        window=128, cand_k=48, ov_slots=6, return_sxyz=True)
    wn, sxyz = pair
    plain = wn.to_neighborhood()
    feats = jnp.asarray(rng.randn(512, 16).astype(np.float32))

    conv = PointNetConvFast((8, 8), 16)
    params = conv.init(jax.random.PRNGKey(0), sxyz, feats, wn)
    out_w = conv.apply(params, sxyz, feats, wn)
    out_p = conv.apply(params, sxyz, feats, plain)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_p),
                               rtol=1e-5, atol=1e-6)


def test_fast_conv_xyz_fold_matches_sxyz_path(rng):
    """The xyz fold (gather hi/mid coordinate columns, reconstruct sxyz
    in-layer) must equal the search-sxyz path: same params, same windowed
    neighborhood, rescaled band."""
    from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast

    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=512)
    (pair,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.4, 12),), tile=128,
        window=128, cand_k=48, ov_slots=6, return_sxyz=True)
    wn, sxyz = pair
    feats = jnp.asarray(rng.randn(512, 16).astype(np.float32))
    rescale = 0.4

    conv = PointNetConvFast((8, 8), 16)
    params = conv.init(jax.random.PRNGKey(0), sxyz / rescale, feats, wn)
    want = conv.apply(params, sxyz / rescale, feats, wn)
    got = conv.apply(params, None, feats, wn, xyz=jnp.asarray(xyz),
                     inv_rescale=1.0 / rescale)
    # f32 fold is exact up to the (xyz_j - xyz_i) recomputation order
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients wrt feats must match too (sxyz is stop-gradient in both)
    def loss(path_sxyz):
        def f(ft):
            if path_sxyz:
                o = conv.apply(params, sxyz / rescale, ft, wn)
            else:
                o = conv.apply(params, None, ft, wn,
                               xyz=jnp.asarray(xyz),
                               inv_rescale=1.0 / rescale)
            return jnp.sum(o ** 2)
        return jax.grad(f)(feats)

    np.testing.assert_allclose(np.asarray(loss(False)),
                               np.asarray(loss(True)), rtol=1e-4, atol=1e-4)


def test_fast_conv_xyz_fold_with_pool(rng):
    """Fold through the tile-shared overflow pool: invalid pool slots must
    still self-pad (sxyz exactly 0) and outputs match the sxyz path."""
    from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast

    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=500)
    (pair,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.5, 12),), tile=128,
        window=128, cand_k=48, ov_slots=6, ov_pool_size=32,
        return_sxyz=True)
    wn, sxyz = pair
    assert wn.pool_idx is not None
    feats = jnp.asarray(rng.randn(512, 16).astype(np.float32))
    conv = PointNetConvFast((8,), 8)
    params = conv.init(jax.random.PRNGKey(1), sxyz, feats, wn)
    want = conv.apply(params, sxyz, feats, wn)
    got = conv.apply(params, None, feats, wn, xyz=jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_windowed_sxyz_consistent(rng):
    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=490)
    res = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=48, ov_slots=6, return_sxyz=True)
    for (mn, mx, k), (wn, sxyz) in zip(BANDS, res):
        g = np.asarray(wn.global_idx)
        m = np.asarray(wn.mask)
        expect = xyz[g] - xyz[:, None, :]
        err = np.abs((np.asarray(sxyz) - expect) * m[..., None]).max()
        assert err < 1e-6, (mn, mx, err)
        # masked slots are exactly zero
        assert np.abs(np.asarray(sxyz)[~m]).max() == 0.0


def test_edge_overflow_integrity_and_recall(rng):
    """ov_mode='edges': sorted centers, exact geometry, and union recall at
    least as good as slot mode (shared capacity serves the tail)."""
    xyz, mask, _ = _sorted_cloud(rng, 1024, n_valid=1000)
    res = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=64, return_sxyz=True, ov_mode="edges", edge_ratio=4)
    res_slots = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), BANDS, tile=128, window=128,
        cand_k=64, ov_slots=8, return_sxyz=True)
    edges = res[0][2]
    c = np.asarray(edges.center)
    m = np.asarray(edges.mask)
    assert (np.diff(c) >= 0).all()          # sorted for segment reductions
    d = xyz[np.asarray(edges.nbr)[m]] - xyz[c[m]]
    np.testing.assert_allclose(d, np.asarray(edges.sxyz)[m], atol=1e-6)
    np.testing.assert_allclose((d ** 2).sum(1), np.asarray(edges.d2)[m],
                               atol=1e-5)

    for (mn, mx, k), (wn, _, ed), (wns, _) in zip(BANDS, res, res_slots):
        oracle_idx, oracle_mask = np_radius_neighbors(xyz, mask, mx, k,
                                                      min_radius=mn)
        em = np.asarray(ed.band_mask(mn, mx))
        union = {}
        g = np.asarray(wn.global_idx)
        wm = np.asarray(wn.mask)
        for i in range(1024):
            union[i] = set(g[i][wm[i]].tolist())
        for e in np.where(em)[0]:
            union[int(c[e])].add(int(np.asarray(ed.nbr)[e]))
        gs = np.asarray(wns.global_idx)
        ms_ = np.asarray(wns.mask)
        tot = hit = hit_slots = 0
        for i in range(1024):
            if not mask[i]:
                continue
            true = set(oracle_idx[i][oracle_mask[i]].tolist())
            tot += len(true)
            hit += len(true & union[i])
            hit_slots += len(true & set(gs[i][ms_[i]].tolist()))
        assert hit >= hit_slots, (mn, mx, hit, hit_slots)
        assert hit / max(tot, 1) >= 0.995, (mn, mx, hit / tot)


def test_edge_conv_matches_slot_union(rng):
    """PointNetConvFast fed (windowed + edge list) must equal the same conv
    fed one plain Neighborhood holding the union of both edge sets."""
    from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast
    from pointcloudsegmentation_tpu.ops.types import Neighborhood

    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=512)
    band = (0.0, 0.45, 12)
    (trip,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), (band,), tile=128, window=128,
        cand_k=48, return_sxyz=True, ov_mode="edges", edge_ratio=4)
    wn, sxyz, ed = trip
    # pack the union into plain slots
    g = np.asarray(wn.global_idx)
    wm = np.asarray(wn.mask)
    em = np.asarray(ed.band_mask(band[0], band[1]))
    per = {i: list(zip(g[i][wm[i]], np.asarray(sxyz)[i][wm[i]] / 0.45))
           for i in range(512)}
    for e in np.where(em)[0]:
        i = int(np.asarray(ed.center)[e])
        per[i].append((int(np.asarray(ed.nbr)[e]),
                       np.asarray(ed.sxyz)[e] / 0.45))
    kmax = max(len(v) for v in per.values())
    idx = np.tile(np.arange(512, dtype=np.int32)[:, None], (1, kmax))
    msk = np.zeros((512, kmax), bool)
    sx = np.zeros((512, kmax, 3), np.float32)
    for i, v in per.items():
        for j, (jj, s) in enumerate(v):
            idx[i, j] = jj
            msk[i, j] = True
            sx[i, j] = s
    plain = Neighborhood(idx=jnp.asarray(idx), mask=jnp.asarray(msk))

    feats = jnp.asarray(rng.randn(512, 16).astype(np.float32))
    conv = PointNetConvFast((8, 8), 16)
    params = conv.init(jax.random.PRNGKey(0), sxyz / 0.45, feats, wn,
                       ed, (band[0], band[1]), 0.45)
    out_e = conv.apply(params, sxyz / 0.45, feats, wn, ed,
                       (band[0], band[1]), 0.45)
    out_p = conv.apply(params, jnp.asarray(sx), feats, plain)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)


def test_edge_truncation_drops_farthest_rank(rng):
    """With a tiny cap, kept edges must be each point's nearest-rank prefix
    (global rank-major fill), never biased by point index."""
    xyz, mask, _ = _sorted_cloud(rng, 512, n_valid=512)
    (trip,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.6, 16),), tile=128,
        window=128, cand_k=64, return_sxyz=True, ov_mode="edges",
        edge_ratio=1)
    wn, _, ed = trip
    (trip_full,) = search.windowed_multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.6, 16),), tile=128,
        window=128, cand_k=64, return_sxyz=True, ov_mode="edges",
        edge_ratio=16)
    _, _, ed_full = trip_full
    demand = int(ed_full.mask.sum())
    assert int(ed.mask.sum()) == min(demand, 512)
    # every kept edge's rank (distance order within its center's full edge
    # set) must be below the dropped count threshold, i.e. kept = the
    # globally nearest ranks.  Verify per center: kept d2 prefix of full d2.
    c = np.asarray(ed.center)[np.asarray(ed.mask)]
    d2 = np.asarray(ed.d2)[np.asarray(ed.mask)]
    cf = np.asarray(ed_full.center)[np.asarray(ed_full.mask)]
    d2f = np.asarray(ed_full.d2)[np.asarray(ed_full.mask)]
    max_kept_rank = 0
    for i in set(c.tolist()):
        mine = np.sort(d2[c == i])
        full = np.sort(d2f[cf == i])
        np.testing.assert_allclose(mine, full[:len(mine)], atol=1e-6)
        max_kept_rank = max(max_kept_rank, len(mine))
    if demand > 512:
        # truncated: kept ones are always the nearest (prefix check above)
        assert len(c) < len(cf)


def test_band_neighbors_auto_fallback(rng):
    """Small / non-tile-aligned / UNSORTED levels must fall back to the
    global path; the windowed path needs the caller's sorted=True."""
    from pointcloudsegmentation_tpu.ops.types import Neighborhood

    xyz, mask = random_cloud(rng, 200, n_valid=180)
    (nbr,) = search.band_neighbors_auto(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.4, 8),), cand_k=32,
        sorted=True)
    assert isinstance(nbr, Neighborhood)
    xs, ms, _ = _sorted_cloud(rng, 1024, n_valid=1024)
    (wnbr,) = search.band_neighbors_auto(
        jnp.asarray(xs), jnp.asarray(ms), ((0.0, 0.4, 8),), cand_k=32,
        sorted=True)
    assert isinstance(wnbr, WindowedNeighborhood)
    # sortedness not asserted -> global path even when shape-eligible
    # (unsorted points through the windowed path are a silent recall loss)
    (gnbr,) = search.band_neighbors_auto(
        jnp.asarray(xs), jnp.asarray(ms), ((0.0, 0.4, 8),), cand_k=32)
    assert isinstance(gnbr, Neighborhood)


def test_morton_order_coarsens_large_scenes(rng):
    """morton_order must COARSEN the cell (not clip coords) when
    block_size/cell exceeds the 10-bit grid: with clipping, a 24 m scene
    at scene_extent=1024/cell=0.05 collapsed into ONE cell and the 'sort'
    was the identity (ADVICE r2, scene_shard fidelity bug)."""
    from pointcloudsegmentation_tpu.ops import morton

    n = 2048
    xyz = (rng.rand(n, 3).astype(np.float32) - 0.5) * 24.0
    mask = np.ones(n, bool)
    order = np.asarray(morton.morton_order(
        jnp.asarray(xyz), jnp.asarray(mask), 0.05, 1024.0))
    assert not np.array_equal(order, np.arange(n))  # actually sorts
    # sorted points are spatially local: mean index-neighbor distance far
    # below the random-order expectation (~half the scene diagonal)
    xs = xyz[order]
    step = np.linalg.norm(np.diff(xs, axis=0), axis=1)
    assert step.mean() < 0.25 * np.linalg.norm([24.0] * 3)


def test_tile_shared_pool_matches_slots(rng):
    """With a pool big enough to hold every tile's overflow targets, the
    pool path must produce the SAME edge set as per-point slots, bit-exact
    gathers included (the pool is a gather-count optimization, not an
    approximation)."""
    n = 1024
    xs, ms, _ = _sorted_cloud(rng, n, n_valid=n - 50)
    bands = ((0.0, 0.3, 16), (0.3, 0.45, 12))
    slots = search.windowed_multi_band_neighbors(
        jnp.asarray(xs), jnp.asarray(ms), bands, return_sxyz=True)
    pool = search.windowed_multi_band_neighbors(
        jnp.asarray(xs), jnp.asarray(ms), bands, return_sxyz=True,
        ov_pool_size=n)
    feats = jnp.asarray(rng.rand(n, 8).astype(np.float32))
    for (ns, sxs), (np_, sxp) in zip(slots, pool):
        assert np_.pool_idx is not None
        m_s = np.asarray(ns.mask)
        m_p = np.asarray(np_.mask)
        assert np.array_equal(m_s, m_p)
        assert np.array_equal(np.asarray(ns.to_neighborhood().idx)[m_s],
                              np.asarray(np_.to_neighborhood().idx)[m_p])
        gs = np.asarray(nb.gather_neighbors(feats, ns))
        gp = np.asarray(nb.gather_neighbors(feats, np_))
        assert np.array_equal(gs[m_s], gp[m_p])
        assert np.allclose(np.asarray(sxs), np.asarray(sxp))


def test_tile_shared_pool_drop_priority(rng):
    """When a tile's unique overflow targets exceed P, drops must be
    nearest-rank-first: any point whose rank-r entry survives must also
    keep all ranks < r present in the pool (no spatial/index bias)."""
    n = 1024
    xs, ms, _ = _sorted_cloud(rng, n, n_valid=n)
    bands = ((0.0, 0.5, 16),)
    small_p = 16
    (np_, _), = search.windowed_multi_band_neighbors(
        jnp.asarray(xs), jnp.asarray(ms), bands, return_sxyz=True,
        ov_pool_size=small_p)
    (ns, _), = search.windowed_multi_band_neighbors(
        jnp.asarray(xs), jnp.asarray(ms), bands, return_sxyz=True)
    # pool path loses edges only (never invents them)
    es = {(r, c) for r, c in zip(*np.where(np.asarray(ns.mask)))}
    ep = {(r, c) for r, c in zip(*np.where(np.asarray(np_.mask)))}
    ko = ns.ov_idx.shape[-1]
    k = ns.lidx.shape[-1]
    gp = np.asarray(np_.to_neighborhood().idx)
    gs_all = np.asarray(ns.to_neighborhood().idx)
    pool = np.asarray(np_.pool_idx)
    valid_pool = set()
    for t in range(pool.shape[0]):
        valid_pool |= {(t, int(v)) for v in pool[t]}
    # every surviving overflow edge's target is in its tile's pool
    for (r, c) in ep:
        if c >= k:
            assert (r // 256, int(gp[r, c])) in valid_pool

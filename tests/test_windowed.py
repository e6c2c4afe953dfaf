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


def test_band_neighbors_auto_fallback(rng):
    """Small / non-tile-aligned levels must fall back to the global path."""
    from pointcloudsegmentation_tpu.ops.types import Neighborhood

    xyz, mask = random_cloud(rng, 200, n_valid=180)
    (nbr,) = search.band_neighbors_auto(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, 0.4, 8),), cand_k=32)
    assert isinstance(nbr, Neighborhood)
    xs, ms, _ = _sorted_cloud(rng, 1024, n_valid=1024)
    (wnbr,) = search.band_neighbors_auto(
        jnp.asarray(xs), jnp.asarray(ms), ((0.0, 0.4, 8),), cand_k=32)
    assert isinstance(wnbr, WindowedNeighborhood)

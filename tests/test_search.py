"""Oracle tests for fixed-K radius/annulus/kNN search (reference analog:
tf_ops/PoolingIndex/test_neighborhood.py, test_neighborhood_fixed.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from oracles import np_radius_neighbors, random_cloud
from pointcloudsegmentation_tpu.ops import search
from pointcloudsegmentation_tpu.ops import interpolate as interp


@pytest.mark.parametrize("min_r,max_r", [(0.0, 0.5), (0.3, 0.6)])
def test_radius_matches_oracle(rng, min_r, max_r):
    xyz, mask = random_cloud(rng, 130, n_valid=115)
    k = 12
    nbr = search.radius_neighbors(jnp.asarray(xyz), jnp.asarray(mask),
                                  max_r, k, min_radius=min_r, chunk=64)
    oidx, omask = np_radius_neighbors(xyz, mask, max_r, k, min_radius=min_r)
    idx, nmask = np.asarray(nbr.idx), np.asarray(nbr.mask)
    np.testing.assert_array_equal(nmask.sum(1), omask.sum(1))
    # compare as sets of (distance-sorted) neighbors; ties may reorder ids
    for i in range(len(xyz)):
        got = set(idx[i][nmask[i]])
        want = set(oidx[i][omask[i]])
        assert got == want, f"row {i}"
    # self-edge present iff min_radius == 0
    has_self = ((idx == np.arange(len(xyz))[:, None]) & nmask).any(1)
    if min_r == 0.0:
        assert np.all(has_self[mask])
    else:
        assert not has_self.any()


def test_invalid_points_have_no_neighbors(rng):
    xyz, mask = random_cloud(rng, 64, n_valid=40)
    nbr = search.radius_neighbors(jnp.asarray(xyz), jnp.asarray(mask),
                                  0.7, 8, chunk=32)
    nmask = np.asarray(nbr.mask)
    assert not nmask[~mask].any()
    # invalid neighbor slots self-pad (safe to gather)
    idx = np.asarray(nbr.idx)
    assert np.all(idx[~nmask] == np.tile(np.arange(64)[:, None], (1, 8))[~nmask])


def test_knn_in_support(rng):
    s_xyz, s_mask = random_cloud(rng, 90, n_valid=80)
    q_xyz, q_mask = random_cloud(rng, 50, n_valid=45)
    k = 5
    idx, d2, valid = search.knn_in_support(
        jnp.asarray(q_xyz), jnp.asarray(q_mask),
        jnp.asarray(s_xyz), jnp.asarray(s_mask), k, chunk=16)
    idx, d2, valid = map(np.asarray, (idx, d2, valid))
    for i in range(50):
        if not q_mask[i]:
            assert not valid[i].any()
            continue
        dd = ((s_xyz - q_xyz[i]) ** 2).sum(1)
        dd[~s_mask] = np.inf
        want = np.sort(dd)[:k]
        np.testing.assert_allclose(np.sort(d2[i]), want, rtol=1e-4, atol=1e-5)


def test_interpolate_probs_exact_on_support(rng):
    """A query sitting exactly on a support point recovers its probs."""
    s_xyz, s_mask = random_cloud(rng, 40)
    probs = rng.rand(40, 6).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    q = s_xyz[:10]
    out = np.asarray(interp.interpolate_probs(
        jnp.asarray(s_xyz), jnp.asarray(s_mask), jnp.asarray(probs),
        jnp.asarray(q), jnp.ones(10, bool), k=1, ratio=100.0, chunk=8))
    np.testing.assert_allclose(out, probs[:10], rtol=1e-4, atol=1e-5)


def test_interpolate_probs_is_convex_combination(rng):
    s_xyz, s_mask = random_cloud(rng, 64)
    probs = rng.rand(64, 4).astype(np.float32)
    q_xyz, q_mask = random_cloud(rng, 32)
    out = np.asarray(interp.interpolate_probs(
        jnp.asarray(s_xyz), jnp.asarray(s_mask), jnp.asarray(probs),
        jnp.asarray(q_xyz), jnp.asarray(q_mask), k=6, chunk=16))
    assert out.min() >= probs.min() - 1e-5
    assert out.max() <= probs.max() + 1e-5

"""Oracle + gradient tests for neighborhood gather/scatter and masked
reductions (reference test analog: tf_ops/test/test_neighbor_scatter.py,
test_max_pool.py, test_feats_sum_scatter.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from pointcloudsegmentation_tpu.ops import neighbors as nb
from pointcloudsegmentation_tpu.ops.types import Neighborhood


def make_nbr(rng, n=37, k=7, zero_rows=(3, 11)):
    """Random neighborhood with some zero-neighbor points (the reference's
    tests explicitly include them, test_neighbor_scatter.py:171-185)."""
    idx = rng.randint(0, n, (n, k)).astype(np.int32)
    mask = rng.rand(n, k) < 0.7
    for r in zero_rows:
        mask[r] = False
    idx = np.where(mask, idx, np.arange(n, dtype=np.int32)[:, None])
    return Neighborhood(idx=jnp.asarray(idx), mask=jnp.asarray(mask))


def test_gather_and_diff(rng):
    n, k, f = 37, 7, 5
    nbr = make_nbr(rng, n, k)
    feats = rng.randn(n, f).astype(np.float32)
    got = np.asarray(nb.gather_neighbors(jnp.asarray(feats), nbr))
    np.testing.assert_allclose(got, feats[np.asarray(nbr.idx)], rtol=1e-6)

    diff = np.asarray(nb.neighbor_diff(jnp.asarray(feats), nbr))
    want = feats[np.asarray(nbr.idx)] - feats[:, None, :]
    np.testing.assert_allclose(diff, want, rtol=1e-6)
    # invalid slots are exactly zero (self minus self)
    assert np.all(diff[~np.asarray(nbr.mask)] == 0)


def test_concat(rng):
    n, k, f = 20, 5, 4
    nbr = make_nbr(rng, n, k, zero_rows=())
    feats = rng.randn(n, f).astype(np.float32)
    got = np.asarray(nb.neighbor_concat(jnp.asarray(feats), nbr))
    assert got.shape == (n, k, 2 * f)
    np.testing.assert_allclose(got[..., :f],
                               np.tile(feats[:, None], (1, k, 1)), rtol=1e-6)
    np.testing.assert_allclose(got[..., f:], feats[np.asarray(nbr.idx)],
                               rtol=1e-6)


@pytest.mark.parametrize("reducer,npop", [
    (nb.masked_sum, np.sum), (nb.masked_max, np.max), (nb.masked_mean, np.mean)])
def test_masked_reductions(rng, reducer, npop):
    n, k, f = 37, 7, 6
    nbr = make_nbr(rng, n, k)
    edge = rng.randn(n, k, f).astype(np.float32)
    got = np.asarray(reducer(jnp.asarray(edge), nbr))
    mask = np.asarray(nbr.mask)
    for i in range(n):
        rows = edge[i][mask[i]]
        want = npop(rows, axis=0) if len(rows) else np.zeros(f, np.float32)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_masked_mean_eps(rng):
    n, k, f = 16, 5, 3
    nbr = make_nbr(rng, n, k, zero_rows=(2,))
    edge = rng.randn(n, k, f).astype(np.float32)
    got = np.asarray(nb.masked_mean_eps(jnp.asarray(edge), nbr))
    mask, eps = np.asarray(nbr.mask), 1e-3
    for i in range(n):
        cnt = mask[i].sum()
        want = (1 + eps) / (cnt + eps) * edge[i][mask[i]].sum(0) \
            if cnt else np.zeros(f, np.float32)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_gradients(rng):
    """Numerical gradient checks (the reference's
    eval_numerical_gradient_array pattern, tf_ops/test/np_ops.py:5-24)."""
    n, k, f = 12, 4, 3
    nbr = make_nbr(rng, n, k, zero_rows=(5,))
    feats = jnp.asarray(rng.randn(n, f).astype(np.float32))

    check_grads(lambda x: nb.masked_sum(nb.neighbor_diff(x, nbr), nbr),
                (feats,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
    check_grads(lambda x: nb.masked_mean_eps(
        nb.gather_neighbors(x, nbr) ** 2, nbr),
        (feats,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_max_gradient_routes_to_argmax(rng):
    """Backward of masked max must scatter only to argmax slots
    (NeighborMaxFeatScatter semantics, TFNeighborKernelNew.cu:121-207)."""
    n, k = 6, 3
    nbr = make_nbr(rng, n, k, zero_rows=())
    nbr = Neighborhood(idx=nbr.idx, mask=nbr.mask.at[:, 0].set(True))
    feats = jnp.asarray(rng.randn(n, 2).astype(np.float32))

    def f(x):
        return jnp.sum(nb.masked_max(nb.gather_neighbors(x, nbr), nbr))

    g = np.asarray(jax.grad(f)(feats))
    # each (point, feature) contributes exactly one unit of gradient
    assert np.isclose(g.sum(), n * 2, atol=1e-5)

"""PointNetConvFast must span the same function family as the naive layer:
with parameters mapped from a naive-layer init, outputs match exactly."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.models.fast_conv import PointNetConvFast
from pointcloudsegmentation_tpu.models.layers import PointNetConv
from pointcloudsegmentation_tpu.ops import neighbors as nb
from pointcloudsegmentation_tpu.ops.types import Neighborhood


def make_nbr(rng, n, k):
    idx = rng.randint(0, n, (n, k)).astype(np.int32)
    mask = rng.rand(n, k) < 0.8
    idx = np.where(mask, idx, np.arange(n, dtype=np.int32)[:, None])
    return Neighborhood(idx=jnp.asarray(idx), mask=jnp.asarray(mask))


def map_params(naive, f, fc_dims, out_dim):
    """Split each naive kernel over [c_{i-1}..c_1, cen, nbr, sxyz] rows into
    the fast layer's per-source kernels.

    Naive input layout at layer i: [c_{i-1}, ..., c_1, cen, nbr, sxyz]
    (concat([c, x]) prepends the newest hidden)."""
    fp = {"params": {}}
    dims = list(fc_dims) + [out_dim]
    for i, d in enumerate(dims):
        name = f"fc_{i}" if i < len(fc_dims) else "fc_out"
        kern = naive["params"][name]["kernel"]
        bias = naive["params"][name]["bias"]
        hidden_dims = list(fc_dims[:i])[::-1]  # newest first
        row = 0
        blocks = {}
        for j, hd in enumerate(hidden_dims):
            # hidden j in naive order corresponds to c_{i-j} -> fast name h{idx}
            blocks[f"fc_{i}_h{len(hidden_dims) - 1 - j}"] = \
                kern[row:row + hd]
            row += hd
        blocks[f"fc_{i}_cen"] = kern[row:row + f]
        row += f
        blocks[f"fc_{i}_nbr"] = kern[row:row + f]
        row += f
        blocks[f"fc_{i}_sxyz"] = kern[row:row + 3]
        row += 3
        assert row == kern.shape[0]
        for bn, bk in blocks.items():
            entry = {"kernel": bk}
            if bn.endswith("_cen"):
                entry["bias"] = bias
            fp["params"][bn] = entry
    return fp


def test_fast_conv_matches_naive(rng):
    n, k, f = 64, 8, 10
    fc_dims, out_dim = (8, 8, 16), 32
    nbr = make_nbr(rng, n, k)
    feats = jnp.asarray(rng.randn(n, f).astype(np.float32))
    sxyz = jnp.asarray(rng.randn(n, k, 3).astype(np.float32))

    naive = PointNetConv(fc_dims, out_dim)
    p = naive.init(jax.random.PRNGKey(0), sxyz, feats, nbr)
    want = naive.apply(p, sxyz, feats, nbr)

    fast = PointNetConvFast(fc_dims, out_dim)
    fp = map_params(p, f, fc_dims, out_dim)
    got = fast.apply(fp, sxyz, feats, nbr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fast_conv_param_shapes(rng):
    """Fresh init works and produces the same output shape."""
    n, k, f = 32, 4, 6
    nbr = make_nbr(rng, n, k)
    feats = jnp.asarray(rng.randn(n, f).astype(np.float32))
    sxyz = jnp.asarray(rng.randn(n, k, 3).astype(np.float32))
    fast = PointNetConvFast((8, 8), 16)
    p = fast.init(jax.random.PRNGKey(0), sxyz, feats, nbr)
    out = fast.apply(p, sxyz, feats, nbr)
    assert out.shape == (n, 16)
    assert np.isfinite(np.asarray(out)).all()

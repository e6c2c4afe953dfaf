"""Pallas windowed-gather kernel tests (interpret mode on CPU; the TPU
exactness run lives in the r3 measurement log — both paths share this
oracle).  The kernels are the opt-in PCS_PALLAS_GATHER=1 alternative to the
XLA one-hot einsum pair in ops/neighbors.py; they must match it bit-exactly
(bf16 and f32) so the knob never changes results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudsegmentation_tpu.ops.pallas import dslab_bwd, gather_fwd

N, T, W = 1024, 128, 128
S = T + 2 * W


def _mk(rng, f, k, dtype):
    feats = jnp.asarray(rng.randn(N, f)).astype(dtype)
    lidx = jnp.asarray(rng.randint(0, S, (N, k)).astype(np.int32))
    return feats, lidx


@pytest.mark.parametrize("f,k,dtype", [
    (8, 8, jnp.bfloat16), (16, 12, jnp.bfloat16), (4, 16, jnp.float32)])
def test_gather_fwd_matches_take(rng, f, k, dtype):
    feats, lidx = _mk(rng, f, k, dtype)
    got = gather_fwd(feats, lidx, W, T)
    fp = jnp.pad(feats, ((W, W), (0, 0)))
    gidx = lidx + ((jnp.arange(N) // T) * T)[:, None]
    want = jnp.take(fp, gidx, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("f,k,dtype", [
    (8, 8, jnp.bfloat16), (4, 12, jnp.float32)])
def test_dslab_bwd_matches_einsum(rng, f, k, dtype):
    _, lidx = _mk(rng, f, k, dtype)
    g = jnp.asarray(rng.randn(N, k, f)).astype(dtype)
    got = dslab_bwd(g, lidx, W, T).astype(jnp.float32)
    nt = N // T
    oh = jax.nn.one_hot(lidx.reshape(nt, T, k), S, dtype=jnp.float32)
    want = jnp.einsum("ntks,ntkf->nsf", oh,
                      g.reshape(nt, T, k, f).astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(want.astype(dtype)
                                          .astype(jnp.float32)),
                               rtol=1e-6, atol=1e-6)


def test_pallas_knob_route_through_model_gather(rng, monkeypatch):
    """PCS_PALLAS_GATHER=1 routes windowed_gather through the kernels and
    produces identical values to the default XLA path."""
    from pointcloudsegmentation_tpu.ops import neighbors as nb
    from pointcloudsegmentation_tpu.ops.types import WindowedNeighborhood

    feats = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    lidx = jnp.asarray(rng.randint(0, S, (N, 8)).astype(np.int32))
    mask = jnp.asarray(rng.rand(N, 8) < 0.8)
    wn = WindowedNeighborhood(
        lidx=lidx, wmask=mask, window=W, tile=T,
        ov_idx=jnp.zeros((N, 0), jnp.int32),
        ov_mask=jnp.zeros((N, 0), bool))

    def run():
        out, vjp = jax.vjp(lambda f_: nb.windowed_gather(f_, wn), feats)
        (dfeats,) = vjp(jnp.ones_like(out))
        return np.asarray(out), np.asarray(dfeats)

    monkeypatch.setenv("PCS_PALLAS_GATHER", "0")
    monkeypatch.setenv("PCS_ONEHOT_FWD", "1")
    out_x, d_x = run()
    monkeypatch.setenv("PCS_PALLAS_GATHER", "1")
    out_p, d_p = run()
    np.testing.assert_array_equal(out_p, out_x)
    np.testing.assert_allclose(d_p, d_x, rtol=1e-6, atol=1e-6)

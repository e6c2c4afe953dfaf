"""Pallas kernel tests (run via the XLA fallback on CPU; oracle + grads)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from pointcloudsegmentation_tpu.ops.pallas import project_max


def test_project_max_matches_oracle(rng):
    n, k, d, o = 64, 8, 16, 32
    x = rng.randn(n, k, d).astype(np.float32)
    w = rng.randn(d, o).astype(np.float32)
    b = rng.randn(o).astype(np.float32)
    mask = rng.rand(n, k) < 0.7
    mask[3] = False  # zero-neighbor row -> 0 output
    got = np.asarray(project_max(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), jnp.asarray(mask)))
    y = x @ w + b
    for i in range(n):
        rows = y[i][mask[i]]
        want = rows.max(0) if len(rows) else np.zeros(o, np.float32)
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_project_max_grads(rng):
    n, k, d, o = 16, 4, 6, 8
    x = jnp.asarray(rng.randn(n, k, d).astype(np.float32))
    w = jnp.asarray(rng.randn(d, o).astype(np.float32))
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, k) < 0.8)

    check_grads(lambda x_, w_, b_: jnp.sum(
        project_max(x_, w_, b_, mask) ** 2), (x, w, b),
        order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def test_project_max_grad_is_argmax_routed(rng):
    n, k, d, o = 8, 3, 4, 5
    x = jnp.asarray(rng.randn(n, k, d).astype(np.float32))
    w = jnp.asarray(rng.randn(d, o).astype(np.float32))
    b = jnp.zeros(o)
    mask = jnp.ones((n, k), bool)
    g = jax.grad(lambda x_: jnp.sum(project_max(x_, w, b, mask)))(x)
    # each (point, out-dim) routes exactly one unit of gradient through w
    gy_rows = np.asarray(jnp.abs(g).sum(-1) > 0)
    assert gy_rows.sum() <= n * min(k, o) * k  # sane sparsity

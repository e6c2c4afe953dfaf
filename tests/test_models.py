"""Model zoo smoke + correctness tests: init, forward shapes, finiteness at
valid rows, gradient flow, dropout determinism."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oracles import random_cloud
from pointcloudsegmentation_tpu.models import (
    ECDSegModel, GPNClassModel, PGNetHybrid, PointNetSegEncoder,
    S3DIS_ARCH, SCANNET_ARCH, SEMANTIC3D_ARCH, SegClassifier, ClassifierHead)
from pointcloudsegmentation_tpu.ops import hierarchy as hier

N, NV = 256, 230
CAPS = (128, 48)


def small_pyramid(rng, block=3.0, sizes=(0.3, 0.9)):
    xyz, mask = random_cloud(rng, N, n_valid=NV)
    pyr = hier.build_pyramid(jnp.asarray(xyz), jnp.asarray(mask),
                             voxel_sizes=sizes, caps=CAPS, block_size=block)
    return pyr, jnp.asarray(mask)


@pytest.mark.parametrize("arch,fdim", [
    (S3DIS_ARCH, 12), (SCANNET_ARCH, 12), (SEMANTIC3D_ARCH, 13)])
def test_pointnet_encoder_forward(rng, arch, fdim):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, fdim).astype(np.float32))
    model = PointNetSegEncoder(arch=arch, search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()
    assert np.isfinite(np.asarray(lf)[m]).all()


def test_classifier_head_and_dropout(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    enc = PointNetSegEncoder(arch=S3DIS_ARCH, search_chunk=128)
    params = enc.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = enc.apply(params, pyr, feats)

    head = SegClassifier(num_classes=13)
    hp = head.init(jax.random.PRNGKey(1), gf, lf, False)
    logits_eval = head.apply(hp, gf, lf, False)
    assert logits_eval.shape == (N, 13)
    # eval mode is deterministic
    logits_eval2 = head.apply(hp, gf, lf, False)
    np.testing.assert_array_equal(np.asarray(logits_eval),
                                  np.asarray(logits_eval2))
    # train mode needs a dropout rng and differs across keys
    lt1 = head.apply(hp, gf, lf, True, rngs={"dropout": jax.random.PRNGKey(2)})
    lt2 = head.apply(hp, gf, lf, True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(lt1), np.asarray(lt2))


def test_gradients_flow_end_to_end(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 13, N))
    enc = PointNetSegEncoder(arch=S3DIS_ARCH, search_chunk=128)
    head = SegClassifier(num_classes=13)

    def loss_fn(p):
        gf, lf = enc.apply(p["enc"], pyr, feats)
        logits = head.apply(p["head"], gf, lf, False)
        ce = -jax.nn.log_softmax(logits)[jnp.arange(N), labels]
        return jnp.sum(ce * mask) / jnp.sum(mask)

    params = {"enc": enc.init(jax.random.PRNGKey(0), pyr, feats),
              "head": None}
    gf, lf = enc.apply(params["enc"], pyr, feats)
    params["head"] = head.init(jax.random.PRNGKey(1), gf, lf, False)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least the vast majority of parameters receive gradient signal
    nonzero = sum(float(jnp.any(g != 0)) for g in leaves)
    assert nonzero / len(leaves) > 0.9


def test_ecd_model_forward(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    model = ECDSegModel(search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    assert np.isfinite(np.asarray(gf)[np.asarray(mask)]).all()


def test_pgnet_hybrid_forward(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    model = PGNetHybrid(search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N
    assert np.isfinite(np.asarray(gf)[np.asarray(mask)]).all()


def test_gpn_class_model(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 9).astype(np.float32))
    model = GPNClassModel(search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    vec = model.apply(params, pyr, feats)
    assert vec.ndim == 1
    assert np.isfinite(np.asarray(vec)).all()
    head = ClassifierHead(num_classes=40)
    hp = head.init(jax.random.PRNGKey(1), vec[None, :], False)
    logits = head.apply(hp, vec[None, :], False)
    assert logits.shape == (1, 40)

"""Tests for the auxiliary components: eliminate-center, class-pure
voxelization, context fusion, template/refine models, dense pre-encoder,
viz/profiling utilities, analysis tools."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from oracles import random_cloud
from pointcloudsegmentation_tpu.models import (ContextFusionModel,
                                               DenseFeats, ECDSegModel,
                                               SemanticPoolRefine,
                                               TemplateSegModel)
from pointcloudsegmentation_tpu.models.ecd import ECDStageSpec
from pointcloudsegmentation_tpu.ops import hierarchy as hier
from pointcloudsegmentation_tpu.ops import neighbors as nb
from pointcloudsegmentation_tpu.ops import voxelize as vox
from pointcloudsegmentation_tpu.ops.types import Neighborhood
from pointcloudsegmentation_tpu.utils import viz


def test_eliminate_center(rng):
    n, k = 20, 5
    idx = rng.randint(0, n, (n, k)).astype(np.int32)
    idx[:, 0] = np.arange(n)  # ensure self-edges exist
    mask = np.ones((n, k), bool)
    nbr = Neighborhood(jnp.asarray(idx), jnp.asarray(mask))
    nc = nb.eliminate_center(nbr)
    nc_idx, nc_mask = np.asarray(nc.idx), np.asarray(nc.mask)
    assert not ((nc_idx == np.arange(n)[:, None]) & nc_mask).any()
    # non-self edges survive
    want = (idx != np.arange(n)[:, None]) & mask
    np.testing.assert_array_equal(nc_mask, want)


def test_class_pure_voxels(rng):
    xyz, mask = random_cloud(rng, 150)
    labels = rng.randint(0, 4, 150).astype(np.int32)
    info = vox.voxelize_with_labels(jnp.asarray(xyz), jnp.asarray(mask),
                                    jnp.asarray(labels), 0.5, 3.0, 256, 4)
    seg = np.asarray(info.seg)
    # all members of a voxel share one label
    for v in np.unique(seg[seg < 256]):
        assert len(np.unique(labels[seg == v])) == 1


def test_context_fusion_model(rng):
    n, nc = 256, 64
    xyz, mask = random_cloud(rng, n)
    feats = jnp.asarray(rng.randn(n, 13).astype(np.float32))
    ctx_xyz = jnp.asarray(
        rng.uniform(-25, 25, (nc, 3)).astype(np.float32))
    ctx_feats = jnp.asarray(rng.randn(nc, 13).astype(np.float32))
    ctx_idx = jnp.asarray(rng.randint(0, nc, n).astype(np.int32))

    model = ContextFusionModel(
        encoder=ECDSegModel(specs=(
            ECDStageSpec(radius=0.3, k=8, gc_dims=(8,), final_dim=16,
                         dxyz_scale=0.25),
            ECDStageSpec(radius=0.9, k=8, gc_dims=(8,), final_dim=16,
                         dxyz_scale=1.0),
        ), search_chunk=128),
        num_classes=8, voxel_sizes=(0.25,), caps=(128,), block_size=3.0,
        ctx_block_size=50.0, ctx_cap=32)
    p = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz), feats,
                   jnp.asarray(mask), ctx_xyz, ctx_feats,
                   jnp.ones(nc, bool), ctx_idx, False)
    logits = model.apply(p, jnp.asarray(xyz), feats, jnp.asarray(mask),
                         ctx_xyz, ctx_feats, jnp.ones(nc, bool), ctx_idx,
                         False)
    assert logits.shape == (n, 8)
    assert np.isfinite(np.asarray(logits)[np.asarray(mask)]).all()

    # Context-threading semantics (reference graph_pooling_layer.py:149-189:
    # ctx_idxs are permuted alongside level-0 points through the physical
    # voxel re-sorts and stay per-level-0-point — fusion is level-0-only
    # there too).  Here the only permutation is the in-model Morton sort,
    # which carries ctx_idx; per-point logits must therefore be invariant
    # to it — the same alignment property the reference's repermutation
    # machinery guarantees.
    model_nosort = ContextFusionModel(
        encoder=model.encoder, num_classes=8, voxel_sizes=(0.25,),
        caps=(128,), block_size=3.0, ctx_block_size=50.0, ctx_cap=32,
        morton_sort=False)
    logits_ns = model_nosort.apply(p, jnp.asarray(xyz), feats,
                                   jnp.asarray(mask), ctx_xyz, ctx_feats,
                                   jnp.ones(nc, bool), ctx_idx, False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_ns),
                               rtol=2e-4, atol=2e-4)


def test_template_and_refine_models(rng):
    n = 256
    xyz, mask = random_cloud(rng, n)
    pyr = hier.build_pyramid(jnp.asarray(xyz), jnp.asarray(mask),
                             (0.3, 0.9), (128, 32), 3.0)
    feats = jnp.asarray(rng.randn(n, 6).astype(np.float32))

    tm = TemplateSegModel()
    p = tm.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = tm.apply(p, pyr, feats)
    assert gf.shape[0] == n and np.isfinite(np.asarray(gf)).all()

    pyr1 = hier.build_pyramid(jnp.asarray(xyz), jnp.asarray(mask),
                              (0.5,), (96,), 3.0)
    rm = SemanticPoolRefine()
    sem = jnp.asarray(rng.rand(n, 13).astype(np.float32))
    rp = rm.init(jax.random.PRNGKey(1), pyr1, sem)
    rg, rl = rm.apply(rp, pyr1, sem)
    assert rg.shape[0] == n and rl.shape[0] == n


def test_dense_feats(rng):
    nd, ns = 512, 64
    dxyz, dmask = random_cloud(rng, nd)
    sxyz = dxyz[:ns]
    smask = np.ones(ns, bool)
    dfeats = jnp.asarray(rng.randn(nd, 5).astype(np.float32))
    sfeats = jnp.asarray(rng.randn(ns, 5).astype(np.float32))
    m = DenseFeats(k=8)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(dxyz), dfeats,
               jnp.asarray(dmask), jnp.asarray(sxyz), sfeats,
               jnp.asarray(smask))
    out = m.apply(p, jnp.asarray(dxyz), dfeats, jnp.asarray(dmask),
                  jnp.asarray(sxyz), sfeats, jnp.asarray(smask))
    assert out.shape == (ns, 48 + 5)
    assert np.isfinite(np.asarray(out)).all()


def test_viz_dumps(tmp_path, rng):
    xyz = rng.randn(30, 3).astype(np.float32)
    labels = rng.randint(0, 13, 30)
    path = os.path.join(tmp_path, "pts.txt")
    viz.output_labeled_points(path, xyz, labels, 13)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 30 and len(lines[0].split()) == 6


def test_analysis_capture_and_cluster(rng):
    from pointcloudsegmentation_tpu.eval.analysis import (
        activation_stats, capture_activations, cluster_activations)
    from pointcloudsegmentation_tpu.models.layers import GrowthMLP

    m = GrowthMLP((8, 8), 16)
    x = jnp.asarray(rng.randn(40, 5).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x)
    out, acts = capture_activations(m, p, x)
    assert acts, "no intermediates captured"
    stats = activation_stats(acts)
    assert all(np.isfinite(s["mean"]) for s in stats.values())
    key = next(iter(acts))
    assign = cluster_activations(acts, key, k=4)
    assert set(np.unique(assign)) <= set(range(4))


def test_estimate_normals_plane(rng):
    from pointcloudsegmentation_tpu.ops import geometry, search
    # points on the z=0 plane -> normals ~ +z
    xyz = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    xyz[:, 2] = 0.001 * rng.randn(200)
    mask = np.ones(200, bool)
    nbr = search.radius_neighbors(jnp.asarray(xyz), jnp.asarray(mask),
                                  0.4, 12, chunk=64)
    n = np.asarray(geometry.estimate_normals(jnp.asarray(xyz), nbr))
    assert np.abs(n[:, 2]).mean() > 0.99


def test_anchor_generation():
    from pointcloudsegmentation_tpu.ops import anchors
    for fn, m in ((anchors.grid_anchors_v2, 26), (anchors.grid_anchors, 40)):
        a = fn()
        assert a.shape == (3, m)
        np.testing.assert_allclose(np.linalg.norm(a, axis=0), 1.0, rtol=1e-5)
    km = anchors.sphere_kmeans_anchors(8)
    assert km.shape == (3, 8)
    norms = np.linalg.norm(km, axis=0)
    assert (norms > 0.5).all()  # near the sphere (cluster means shrink a bit)
    # canonicalization: anchor 0 points at +z
    np.testing.assert_allclose(km[:2, 0], 0.0, atol=1e-5)
    assert km[2, 0] > 0

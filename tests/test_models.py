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
    pytest.param(S3DIS_ARCH, 12, marks=pytest.mark.slow),
    (SCANNET_ARCH, 12),
    pytest.param(SEMANTIC3D_ARCH, 13, marks=pytest.mark.slow)])
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_ecd_model_forward(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    model = ECDSegModel(search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    assert np.isfinite(np.asarray(gf)[np.asarray(mask)]).all()


@pytest.mark.slow
def test_pgnet_hybrid_forward(rng):
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    model = PGNetHybrid(search_chunk=128)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N
    assert np.isfinite(np.asarray(gf)[np.asarray(mask)]).all()


@pytest.mark.slow
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


# ---- variant tail (VERDICT r1 missing#5): each constructs + forward-passes


def _nbr_and_sxyz(rng, n=96, k=8, radius=0.6):
    from pointcloudsegmentation_tpu.ops import search
    xyz, mask = random_cloud(rng, n, n_valid=n - 10)
    (nbr, sxyz), = search.multi_band_neighbors(
        jnp.asarray(xyz), jnp.asarray(mask), ((0.0, radius, k),),
        cand_k=min(4 * k, n), chunk=32, return_sxyz=True)
    return jnp.asarray(mask), nbr, sxyz / radius


def test_conv_variant_tail_forward(rng):
    from pointcloudsegmentation_tpu.models import (
        DiffFeatsWLW, DiffusionAnchorConv, ECDFeatsV4, GPNConvV2, WLWConv,
        compute_wlw)
    from pointcloudsegmentation_tpu.ops import anchors as anchor_gen

    mask, nbr, sxyz = _nbr_and_sxyz(rng)
    n = sxyz.shape[0]
    feats = jnp.asarray(rng.randn(n, 10).astype(np.float32))
    m_np = np.asarray(mask)

    def check(mod, *args):
        params = mod.init(jax.random.PRNGKey(0), *args)
        out = mod.apply(params, *args)
        if isinstance(out, tuple):
            out = out[0]
        assert out.shape[0] == n
        assert np.isfinite(np.asarray(out)[m_np]).all()
        return out

    # GPN v2 weight-after-aggregate (graph_conv_layer.py:327-450)
    check(GPNConvV2(m=4, out_dim=8, mode="xyz"), sxyz, None, nbr)
    check(GPNConvV2(m=4, out_dim=8, mode="feats"), sxyz, feats, nbr)

    # wlw sum/concat convs (graph_conv_layer.py:453-541)
    pmiu = jnp.asarray(anchor_gen.sphere_kmeans_anchors(4))
    wlw = compute_wlw(sxyz, nbr, pmiu)
    assert wlw.shape == (n, nbr.k, 4)
    check(WLWConv(m=4, out_dim=8, mode="sum", use_xyz=True),
          sxyz, None, nbr, wlw)
    check(WLWConv(m=4, out_dim=8, mode="sum", use_xyz=False),
          sxyz, feats, nbr, wlw)
    check(WLWConv(m=4, out_dim=8, mode="concat", use_xyz=True),
          sxyz, None, nbr, wlw)
    check(WLWConv(m=4, out_dim=8, mode="concat", use_xyz=False),
          sxyz, feats, nbr, wlw)

    # MLP-predicted wlw (graph_conv_layer.py:543-570)
    dw = DiffFeatsWLW(m=4, fc_dims=(8,))
    p = dw.init(jax.random.PRNGKey(0), feats, nbr)
    wlw2 = dw.apply(p, feats, nbr)
    assert np.isfinite(np.asarray(wlw2)).all()

    # diffusion-anchor v1-v3 (graph_layer_new.py:258-384)
    check(DiffusionAnchorConv(1, 4, 8, (8,)), sxyz, feats, nbr)
    check(DiffusionAnchorConv(2, 4, 8, (8,), embed_dim=4), sxyz, feats, nbr)
    check(DiffusionAnchorConv(3, 4, 8, (8,), embed_dim=4), sxyz, feats, nbr)

    # ecd_feats_v4 (model_pgnet.py:889-918)
    check(ECDFeatsV4((8,), 8), sxyz, feats, nbr)


@pytest.mark.parametrize("conv", ["pointnet", "anchor", "mlp_anchor",
                                  "diffusion_anchor"])
def test_template_stage_flavors(rng, conv):
    """The conv-comparison stage library (model_new.py:105-469): every
    pluggable stage flavor constructs and forward-passes through the
    template harness."""
    from pointcloudsegmentation_tpu.models.ecd import ECDStageSpec
    from pointcloudsegmentation_tpu.models.template import (GenericStage,
                                                            TemplateSegModel)

    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    specs = tuple(
        ECDStageSpec(radius=r, k=8, gxyz_dim=8, gc_dims=(8,),
                     gfc_dims=(8,), final_dim=16, dxyz_scale=v)
        for r, v in ((0.3, 0.3), (0.6, 0.9), (1.0, 3.0)))
    model = TemplateSegModel(
        make_stage=lambda i, spec: GenericStage(
            spec, conv=conv, anchor_num=4, search_chunk=128,
            name=f"stage{i}"),
        specs=specs)
    params = model.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = model.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()
    assert np.isfinite(np.asarray(lf)[m]).all()


def test_seg_head_variants(rng):
    from pointcloudsegmentation_tpu.models import (classifier_v2,
                                                   classifier_v4,
                                                   classifier_v5)
    gf = jnp.asarray(rng.randn(40, 32).astype(np.float32))
    lf = jnp.asarray(rng.randn(40, 8).astype(np.float32))
    for ctor, needs_pfeats in ((classifier_v2, False), (classifier_v4, True),
                               (classifier_v5, True)):
        head = ctor(13)
        args = (gf, lf) if needs_pfeats else (gf,)
        p = head.init(jax.random.PRNGKey(0), *args)
        out = head.apply(p, *args)
        assert out.shape == (40, 13)
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["pgnet_v3", "pgnet_v4", "pgnet_v5",
                                  "pgnet_v6", "pgnet_v7"])
def test_pgnet_variant_models_forward(rng, name):
    from pointcloudsegmentation_tpu.models import (
        ECDSegModel, PGNET_V3_SPEC, PGNET_V4_SPEC, PGNET_V5_SPEC, PGNetV6,
        PGNetV7)

    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    model = {
        "pgnet_v3": lambda: ECDSegModel(specs=PGNET_V3_SPEC,
                                        search_chunk=128),
        "pgnet_v4": lambda: ECDSegModel(specs=PGNET_V4_SPEC,
                                        search_chunk=128),
        "pgnet_v5": lambda: ECDSegModel(specs=PGNET_V5_SPEC,
                                        search_chunk=128),
        "pgnet_v6": lambda: PGNetV6(search_chunk=128),
        "pgnet_v7": lambda: PGNetV7(search_chunk=128),
    }[name]()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = jax.jit(model.apply)(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()
    assert np.isfinite(np.asarray(lf)[m]).all()


def test_refine_cascade_forward_and_grad(rng):
    """Structural check of the refine cascade (train_graph_pool_refine.py
    :44-84): stacked (refine, base) logits, finite gradients through both
    heads and the class-pure pyramid."""
    from pointcloudsegmentation_tpu.models import ECDSegModel, ECDStageSpec
    from pointcloudsegmentation_tpu.train.model_zoo import RefineCascadeModel

    tiny = (ECDStageSpec(radius=0.3, k=8, gxyz_dim=8, gc_dims=(8,),
                         gfc_dims=(8,), final_dim=16, dxyz_scale=0.3),
            ECDStageSpec(radius=0.9, k=8, gxyz_dim=8, gc_dims=(8,),
                         gfc_dims=(8,), final_dim=16, dxyz_scale=3.0))
    model = RefineCascadeModel(
        encoder=ECDSegModel(specs=tiny, search_chunk=64),
        num_classes=13, voxel_sizes=(0.3,), caps=(64,), block_size=3.0)
    xyz, mask = random_cloud(rng, 128, n_valid=110)
    feats = jnp.asarray(rng.randn(128, 12).astype(np.float32))
    xyz, mask = jnp.asarray(xyz), jnp.asarray(mask)
    params = jax.jit(lambda r: model.init(r, xyz, feats, mask, False))(
        jax.random.PRNGKey(0))
    logits = jax.jit(lambda p: model.apply(p, xyz, feats, mask, False))(
        params)
    assert logits.shape == (2, 128, 13)  # (refine, base)
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(logits)[:, m]).all()

    def loss(p):
        lg = model.apply(p, xyz, feats, mask, False)
        return jnp.sum(jnp.where(mask[None, :, None], lg, 0.0) ** 2)
    grads = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # both heads receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    head_live = {"head": False, "refine_head": False}
    for path, g in flat:
        for k in head_live:
            if any(getattr(p, "key", None) == k for p in path):
                head_live[k] |= bool(np.any(np.asarray(g) != 0))
    assert all(head_live.values()), head_live


@pytest.mark.slow
def test_refine_cascade_trains(rng):
    """--model refine_s3dis trains end-to-end on synthetic data
    (train_graph_pool_refine.py:44-84).  Slow: full Trainer compile."""
    from pointcloudsegmentation_tpu.data import toy
    from pointcloudsegmentation_tpu.train import Trainer, s3dis_config

    cfg = s3dis_config(model="refine_s3dis", data_num_points=256,
                       data_caps=(128, 48), optim_epoch_steps=10)
    tr = Trainer(cfg, search_chunk=128)
    rng_ = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=2, num_points=256,
                                 kind="room", num_classes=13, feat_dim=12))
    state = tr.init_state(rng_, batch)
    losses = []
    for i in range(3):
        state, m = tr.train_step(state, batch, rng_)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# -- fast stand-ins for the slow-marked full-spec compiles above ------------

TINY_ARCH = None


def _tiny_arch():
    global TINY_ARCH
    if TINY_ARCH is None:
        from pointcloudsegmentation_tpu.models.pointnet import (Arch,
                                                                ConvSpec,
                                                                StageSpec)
        TINY_ARCH = Arch(stages=(
            StageSpec(rescale=0.3, convs=(
                ConvSpec(radius=0.3, k=8, fc_dims=(4, 4), out=8),
                ConvSpec(radius=0.4, min_radius=0.3, k=6, embed=8,
                         fc_dims=(4, 4), out=8),
            ), pool_fc_dims=(4, 4), pool_out=8),
            StageSpec(rescale=0.9, convs=(
                ConvSpec(radius=0.9, k=8, embed=8, fc_dims=(4, 4), out=8),
            ), pool_fc_dims=None),
        ), global_dims=(8, 8), global_out=16)
    return TINY_ARCH


def test_tiny_encoder_forward_and_grad(rng):
    """CI-fast coverage of the encoder machinery (search cache, dilated
    band, embed, pool block, global MLP, decoder, gradients) on a 2-stage
    tiny arch — the full reference specs compile in the slow suite."""
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    enc = PointNetSegEncoder(arch=_tiny_arch(), search_chunk=128)
    params = enc.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = enc.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()

    def loss_fn(p):
        g, _ = enc.apply(p, pyr, feats)
        return jnp.sum(g ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
    assert nonzero / len(leaves) > 0.8


def test_noconcat_and_deconv_variants(rng):
    """Ablation machinery: pointnet_conv_noconcat convs (plain MLP chain,
    model_pointnet.py:41-54) and the deconv decoder (:87-104, :620-636) —
    tiny-sized forward + decoder param presence."""
    from dataclasses import replace
    from pointcloudsegmentation_tpu.models.pointnet import ConvSpec, \
        StageSpec

    base = _tiny_arch()
    nc_stages = tuple(
        replace(st, convs=tuple(replace(c, noconcat=True, embed=None)
                                for c in st.convs))
        for st in base.stages)
    arch = replace(base, stages=nc_stages, decoder="deconv",
                   deconv_dims=((8, 8),), deconv_out=16)
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    enc = PointNetSegEncoder(arch=arch, search_chunk=128)
    params = enc.init(jax.random.PRNGKey(0), pyr, feats)
    names = jax.tree_util.tree_leaves_with_path(params)
    flat = ["/".join(str(k) for k in path) for path, _ in names]
    assert any("deconv0" in f for f in flat)
    gf, lf = enc.apply(params, pyr, feats)
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()
    # noconcat convs are the plain-MLP family: no per-hidden growth params
    # (fast-path fc_i_h{j} names never appear)
    assert not any("_h0" in f or "_h1" in f for f in flat)


@pytest.mark.slow
def test_pointnet2_baseline_forward(rng):
    """pointnet2_v2 baseline (model_pgnet.py:1133-1223): paired conv units
    + stage-2 anchor convs, 3-level pyramid contract."""
    from pointcloudsegmentation_tpu.models.pointnet import PointNet2Baseline

    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    enc = PointNet2Baseline(search_chunk=128)
    params = enc.init(jax.random.PRNGKey(0), pyr, feats)
    gf, lf = enc.apply(params, pyr, feats)
    assert gf.shape[0] == N and lf.shape[0] == N
    m = np.asarray(mask)
    assert np.isfinite(np.asarray(gf)[m]).all()


def test_factored_head_matches_concat_decoder(rng):
    """The factored classifier-head input (PointNetSegEncoder.head_dim) must
    span the same function family as ``class_mlp1 @ concat-decoder-lf``:
    with the per-source kernels concatenated in lf row order
    [sf_top ‖ gfc ‖ ... ‖ sf_0], outputs match the wide-concat projection."""
    pyr, mask = small_pyramid(rng)
    feats = jnp.asarray(rng.randn(N, 12).astype(np.float32))
    H = 16
    enc_u = PointNetSegEncoder(arch=_tiny_arch(), search_chunk=128)
    enc_f = enc_u.clone(head_dim=H)
    p_f = enc_f.init(jax.random.PRNGKey(0), pyr, feats)
    z, sf0_f = enc_f.apply(p_f, pyr, feats)
    assert z.shape == (N, H)

    # kernel rows in lf concat order: lf_top = [sf_top ‖ gfc];
    # lf_s = [up ‖ sf_s] for s < top  ->  [sf1 ‖ gfc ‖ sf0] for 2 stages
    hp = p_f["params"]
    kern = jnp.concatenate([hp["head_sf1"]["kernel"],
                            hp["head_g"]["kernel"],
                            hp["head_sf0"]["kernel"]], axis=0)
    bias = hp["head_sf0"]["bias"]
    p_u = {"params": {k: v for k, v in hp.items()
                      if not k.startswith("head_")}}
    lf, sf0_u = enc_u.apply(p_u, pyr, feats)
    assert lf.shape[-1] == kern.shape[0]
    want = lf @ kern + bias
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(z)[m], np.asarray(want)[m],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(sf0_f), np.asarray(sf0_u))


def test_premixed_classifier_head(rng):
    """SegClassifier(premixed=True) applies relu directly to the projected
    input and matches the unfactored head when class_mlp1 is folded in."""
    n, h, pf_dim, nc = 64, 16, 12, 5
    z = jnp.asarray(rng.randn(n, h).astype(np.float32))
    pfeats = jnp.asarray(rng.randn(n, pf_dim).astype(np.float32))
    head_p = SegClassifier(nc, dims=(h, 8), premixed=True)
    pp = head_p.init(jax.random.PRNGKey(0), z, pfeats, False)
    out_p = head_p.apply(pp, z, pfeats, False)
    assert out_p.shape == (n, nc)
    # unfactored head with class_mlp1 = identity reproduces it
    head_u = SegClassifier(nc, dims=(h, 8))
    pu = head_u.init(jax.random.PRNGKey(1), z, pfeats, False)
    pu_params = dict(pu["params"])
    pu_params["class_mlp1"] = {"kernel": jnp.eye(h),
                               "bias": jnp.zeros((h,))}
    pu_params["class_mlp2"] = pp["params"]["class_mlp2"]
    pu_params["class_mlp3"] = pp["params"]["class_mlp3"]
    out_u = head_u.apply({"params": pu_params}, z, pfeats, False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)

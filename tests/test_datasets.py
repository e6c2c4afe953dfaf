"""Per-dataset pipeline tests: S3DIS room prep, ScanNet scene prep,
Semantic3D block/context machinery, ModelNet cloud prep."""
import numpy as np
import pytest

from pointcloudsegmentation_tpu.data import (io_util, modelnet, s3dis,
                                             scannet, semantic3d)


def make_room(rng, n=20000, extent=5.0):
    pts = np.concatenate([rng.uniform(0, extent, (n, 3)),
                          rng.randint(0, 255, (n, 3))], 1).astype(np.float32)
    return pts, rng.randint(0, 13, n).astype(np.int32)


def test_s3dis_prepare_room(rng):
    pts, labels = make_room(rng)
    room = s3dis.prepare_room(pts, labels, rng=rng)
    assert len(room["xyzs"]) > 0
    for xyz, rgb, cov, lbl, bmin in zip(room["xyzs"], room["rgbs"],
                                        room["covars"], room["lbls"],
                                        room["block_mins"]):
        # normalized: xy centered around 0 within ±1.5, rgb in ~[-1,1]
        assert np.abs(xyz[:, :2]).max() <= 1.5 + 1e-4
        assert xyz[:, 2].min() >= -1e-5
        assert rgb.min() >= -1.01 and rgb.max() <= 1.01
        assert cov.shape[1] == 9
        assert lbl.max() <= 12
        # reconstruction: xyz + block_min recovers room coordinates
        rec = xyz + bmin
        assert rec[:, 0].min() >= -0.2  # scene coords are non-negative-ish


def test_s3dis_split(tmp_path):
    stems = [f"Area_{a}_room{i}" for a in range(1, 7) for i in range(3)]
    f = tmp_path / "stems.txt"
    f.write_text("\n".join(stems))
    train, test = s3dis.train_test_split(str(f), test_area=5)
    assert len(test) == 3 and all("Area_5" in s for s in test)
    assert len(train) == 15


def test_scannet_prepare_scene(rng):
    xyz = rng.uniform(0, 6, (30000, 3)).astype(np.float32)
    labels = rng.randint(0, 21, 30000).astype(np.int32)
    scene = scannet.prepare_scene(xyz, labels, min_pn=64, rng=rng)
    assert len(scene["xyzs"]) > 0
    blocks = scannet.blocks_from_scene_pkl.__wrapped__ if False else None
    # class weights: rare classes get larger weights
    counts = np.bincount(labels, minlength=21).astype(np.float64)
    counts[3] = 10  # make class 3 rare
    w = scannet.class_weights_from_counts(counts)
    assert w[3] == w.max()


def test_semantic3d_pipeline(rng):
    pts = np.concatenate([
        rng.uniform(0, 90, (40000, 2)), rng.uniform(0, 10, (40000, 1)),
        rng.uniform(0, 2000, (40000, 1)),        # intensity
        rng.randint(0, 255, (40000, 3))], 1).astype(np.float32)
    labels = rng.randint(0, 9, 40000).astype(np.int32)

    big = semantic3d.to_big_blocks(pts, labels, block_size=80.0,
                                   ds_stride=0.5)
    assert len(big) >= 2  # 90m extent -> 2 macro blocks in x

    blocks = semantic3d.sample_training_blocks(
        pts, labels, block_size=10.0, stride=5.0, ds_stride=0.5,
        min_pn=32, rng=rng, covar_nn_size=1.0)
    assert len(blocks) > 4
    b = blocks[0]
    assert b["feats"].shape[1] == 13  # rgb3 + intensity1 + covars9
    assert np.abs(b["xyz"][:, :2]).max() <= 5.0 + 1e-3
    # intensity standardized
    assert abs(b["feats"][:, 3].mean()) < 0.2

    ctx = semantic3d.context_cloud(pts, ds_size=5.0)
    assert ctx.shape[1] == pts.shape[1]
    assert len(ctx) < len(pts) / 10

    idx = semantic3d.context_indices(b["xyz"] + b["block_min"], ctx[:, :3])
    assert idx.shape == (len(b["xyz"]),)
    # nearest context point is within one context cell diagonal
    d = np.linalg.norm((b["xyz"] + b["block_min"]) - ctx[idx][:, :3], axis=1)
    assert np.median(d) < 10.0


def test_modelnet_prepare(rng):
    xyz = rng.randn(512, 3).astype(np.float32) * 2
    c = modelnet.prepare_cloud(xyz, label=7, rng=rng, augment_geometry=True)
    r = np.linalg.norm(c["xyz"], axis=1)
    assert r.max() <= 1.2  # unit-ish sphere (augment rescale ≤1.1)
    assert c["feats"].shape == (512, 9)
    assert (c["labels"] == 7).all()


def test_depth_to_points():
    depth = np.zeros((4, 4), np.float32)
    depth[1, 2] = 2.0
    pts = io_util.depth_to_points(depth, fx=2.0, fy=2.0)
    assert pts.shape == (1, 3)
    np.testing.assert_allclose(pts[0, 2], 2.0)


def test_semantic3d_offset_z_and_test_prep(rng, tmp_path):
    """z-offset maps (semantic3d_util.py:10-60) + test-set presample ->
    deterministic eval blocks -> columnar eval-scene pkl
    (semantic3d_util.py:466-557) driven end-to-end."""
    pts = np.concatenate([
        rng.uniform(0, 60, (30000, 2)), rng.uniform(0, 8, (30000, 1)),
        rng.uniform(0, 2000, (30000, 1)),
        rng.randint(0, 255, (30000, 3))], 1).astype(np.float32)
    # plant a dominant ground plane at z ~= 2.0
    pts[:15000, 2] = 2.0 + 0.05 * rng.randn(15000)

    off = semantic3d.compute_offset_z(pts)
    assert abs(off - 2.0) < 0.2
    path = str(tmp_path / "offsetz.txt")
    m = semantic3d.write_offset_z_map(path, [("scan0", pts)])
    assert semantic3d.read_offset_z_map(path) == m

    macro = semantic3d.presample_test_blocks(pts, block_size=50.0,
                                             stride=45.0, ds_stride=0.5,
                                             min_pn=32)
    assert len(macro) >= 2  # 60 m extent, 50 m blocks @ 45 m stride
    blocks = []
    for mb in macro:
        blocks.extend(semantic3d.process_test_blocks(
            mb, rot_ang=0.0, ds_stride=0.5, covar_nn_size=1.0, min_pn=16))
    assert blocks
    # deterministic: same macro block -> identical eval blocks
    again = semantic3d.process_test_blocks(macro[0], rot_ang=0.0,
                                           ds_stride=0.5,
                                           covar_nn_size=1.0, min_pn=16)
    np.testing.assert_array_equal(
        blocks[0]["xyz"],
        again[0]["xyz"])
    # rotation variant rotates the absolute geometry
    rot = semantic3d.process_test_blocks(macro[0], rot_ang=np.pi / 12,
                                         ds_stride=0.5, covar_nn_size=1.0,
                                         min_pn=16)
    assert not np.allclose(blocks[0]["block_min"], rot[0]["block_min"])

    scene = str(tmp_path / "scene.pkl")
    semantic3d.save_eval_scene(scene, blocks)
    data = io_util.read_pkl(scene)
    assert set(data) == {"xyzs", "rgbs", "lbls", "block_mins"}
    assert len(data["xyzs"]) == len(blocks)


def test_semantic3d_dense_read_fn(rng, tmp_path):
    """dense read_fn yields sampled + dense pairs; Provider pads both
    (train_gpn_semantic3d_dense.py:52-65 feed)."""
    from pointcloudsegmentation_tpu.data.provider import Provider

    pts = np.concatenate([
        rng.uniform(0, 12, (8000, 2)), rng.uniform(0, 5, (8000, 1)),
        rng.uniform(0, 2000, (8000, 1)),
        rng.randint(0, 255, (8000, 3))], 1).astype(np.float32)
    labels = rng.randint(0, 9, 8000).astype(np.int32)
    blocks = semantic3d.sample_training_blocks(
        pts, labels, block_size=10.0, stride=5.0, ds_stride=0.2,
        min_pn=32, rng=rng, covar_nn_size=1.0)
    path = str(tmp_path / "blocks.pkl")
    semantic3d.save_blocks(path, blocks)

    dense = semantic3d.dense_blocks_from_pkl("train", path,
                                             sample_stride=0.5)
    assert dense and len(dense[0]["xyz"]) < len(dense[0]["dense_xyz"])

    p = Provider([path], "train", batch_size=2,
                 read_fn=lambda m, f: semantic3d.dense_blocks_from_pkl(
                     m, f, sample_stride=0.5),
                 num_points=256, dense_num_points=1024)
    batch = next(iter(p))
    p.close()
    assert batch["xyz"].shape == (2, 256, 3)
    assert batch["dense_xyz"].shape == (2, 1024, 3)
    assert batch["dense_mask"].dtype == bool


def test_dense_model_forward_and_grad(rng):
    """Structural check of the dense pipeline: DenseFeats enriches the
    sampled points from the dense cloud, the model produces finite logits
    and gradients (train_gpn_semantic3d_dense.py:52-65)."""
    import jax
    import jax.numpy as jnp
    from pointcloudsegmentation_tpu.models import (ECDSegModel,
                                                   ECDStageSpec)
    from pointcloudsegmentation_tpu.train.model_zoo import DenseSegModel

    tiny = (ECDStageSpec(radius=0.3, k=8, gxyz_dim=8, gc_dims=(8,),
                         gfc_dims=(8,), final_dim=16, dxyz_scale=0.3),
            ECDStageSpec(radius=0.9, k=8, gxyz_dim=8, gc_dims=(8,),
                         gfc_dims=(8,), final_dim=16, dxyz_scale=3.0))
    model = DenseSegModel(
        encoder=ECDSegModel(specs=tiny, search_chunk=64),
        num_classes=9, voxel_sizes=(0.3,), caps=(64,), block_size=3.0)
    dn, sn = 256, 96
    dxyz = jnp.asarray(rng.uniform(-1.5, 1.5, (dn, 3)).astype(np.float32))
    dfeats = jnp.asarray(rng.randn(dn, 13).astype(np.float32))
    dmask = jnp.ones(dn, bool)
    sel = rng.choice(dn, sn, replace=False)
    xyz, feats = dxyz[sel], dfeats[sel]
    mask = jnp.ones(sn, bool)
    params = jax.jit(lambda r: model.init(
        r, xyz, feats, mask, dxyz, dfeats, dmask, False))(
        jax.random.PRNGKey(0))
    logits = jax.jit(lambda p: model.apply(
        p, xyz, feats, mask, dxyz, dfeats, dmask, False))(params)
    assert logits.shape == (sn, 9)
    assert np.isfinite(np.asarray(logits)).all()
    g = jax.jit(jax.grad(lambda p: jnp.sum(model.apply(
        p, xyz, feats, mask, dxyz, dfeats, dmask, False) ** 2)))(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_dense_model_trains():
    """--model dense_semantic3d trains end-to-end on synthetic dense
    batches.  Slow: full Trainer compile."""
    import jax
    from pointcloudsegmentation_tpu.data import toy
    from pointcloudsegmentation_tpu.train import Trainer, semantic3d_config

    cfg = semantic3d_config(model="dense_semantic3d", data_num_points=256,
                            data_caps=(128, 48), optim_epoch_steps=10)
    tr = Trainer(cfg, search_chunk=128)
    rng = jax.random.PRNGKey(0)
    batch = next(toy.dense_batches(1, batch_size=2, num_points=256,
                                   dense_factor=2, num_classes=9,
                                   feat_dim=cfg.data.feat_dim))
    state = tr.init_state(rng, batch)
    losses = []
    for _ in range(3):
        state, m = tr.train_step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_semantic3d_context_pipeline(rng, tmp_path):
    """Context prep -> pkl -> read_fn -> Provider, end-to-end (the offline
    context fan-out semantic3d_context_util.py:578-583 + the trainer feed
    train_gpn_semantic3d_context.py:50-71): every block carries a
    block-relative 50 m context sub-cloud and per-point nearest-context
    indices that survive padding, subsampling and the oversize-remap."""
    from pointcloudsegmentation_tpu.data import semantic3d
    from pointcloudsegmentation_tpu.data.provider import Provider

    # synthetic scan: 60 m x 60 m ground + scattered structures
    n = 20000
    xyz = np.stack([rng.rand(n) * 60.0, rng.rand(n) * 60.0,
                    rng.rand(n) * 8.0], 1).astype(np.float32)
    irgb = np.concatenate([rng.rand(n, 1) * 100.0,
                           rng.randint(0, 255, (n, 3))], 1)
    points = np.concatenate([xyz, irgb], 1).astype(np.float32)
    labels = rng.randint(0, 9, n).astype(np.int32)

    blocks = semantic3d.prepare_context_scene(
        points, labels, min_pn=64, rng=np.random.RandomState(0))
    assert blocks, "no context blocks produced"
    for b in blocks:
        assert b["ctx_xyz"].shape[0] == b["ctx_feats"].shape[0]
        assert b["ctx_feats"].shape[1] == 4          # rgb + intensity
        assert b["ctx_idx"].shape[0] == b["xyz"].shape[0]
        assert (b["ctx_idx"] >= 0).all()
        assert (b["ctx_idx"] < len(b["ctx_xyz"])).all()
        # index really is the nearest context point (block-relative frame)
        d2 = ((b["xyz"][:, None, :] - b["ctx_xyz"][None, :, :]) ** 2).sum(-1)
        assert np.array_equal(b["ctx_idx"], d2.argmin(1))

    pkl = str(tmp_path / "scene.pkl")
    semantic3d.save_blocks(pkl, blocks)

    # tiny ctx cap forces the oversize remap path
    cap = 8
    prov = Provider([pkl], "train", 2, semantic3d.context_blocks_from_pkl,
                    num_points=256, ctx_num_points=cap)
    batch = next(iter(prov))
    prov.close()
    assert batch["ctx_xyz"].shape == (2, cap, 3)
    assert batch["ctx_feats"].shape == (2, cap, 4)
    assert batch["ctx_mask"].shape == (2, cap)
    assert batch["ctx_idx"].shape == (2, 256)
    assert (batch["ctx_idx"] >= 0).all() and (batch["ctx_idx"] < cap).all()
    # remapped indices point at the nearest KEPT context point for every
    # valid block point
    for bi in range(2):
        m = batch["mask"][bi]
        cx = batch["ctx_xyz"][bi][batch["ctx_mask"][bi]]
        d2 = ((batch["xyz"][bi][m][:, None, :] - cx[None, :, :]) ** 2
              ).sum(-1)
        assert np.array_equal(batch["ctx_idx"][bi][m], d2.argmin(1))


def test_synth_rooms_color_signal_survives_prep(rng):
    """Regression: the generator must emit sensor-range rgb (0..255) —
    unit-range colors collapse to ~-0.98 after normalize_block's
    (c-128)/130.5, erasing the per-class color distributions the parity
    A/B depends on."""
    from pointcloudsegmentation_tpu.data import synth_rooms

    blocks = synth_rooms.room_blocks(np.random.RandomState(0), num_rooms=1,
                                     model="test")
    rgb = np.concatenate([b["feats"][:, :3] for b in blocks], 0)
    assert rgb.std() > 0.1                      # real variance, not jitter
    assert rgb.min() < -0.5 and rgb.max() > 0.1  # spans the normalized range
    # per-class mean colors stay distinguishable through the full prep
    labels = np.concatenate([b["labels"] for b in blocks], 0)
    means = {c: rgb[labels == c].mean(0) for c in np.unique(labels)
             if (labels == c).sum() > 50}
    vals = np.stack(list(means.values()))
    assert np.abs(vals[:, None, :] - vals[None, :, :]).max() > 0.3


def test_hard_synth_generator_failure_modes():
    """Hard-mode generator invariants (VERDICT r4 #6): density gradient,
    occlusion holes and speckle actually materialize, multi-room scenes
    span rooms, and the class histogram is S3DIS-grade imbalanced."""
    import numpy as np

    from pointcloudsegmentation_tpu.data import synth_rooms

    rng = np.random.RandomState(3)
    easy, el = synth_rooms.synthetic_s3dis_room(np.random.RandomState(3))
    hard, hl = synth_rooms.synthetic_s3dis_room(np.random.RandomState(3),
                                                hard=True)
    # density gradient + occlusion: hard keeps well under the easy count
    assert len(hard) < 0.8 * len(easy)
    # near-vs-far density ratio: split the room along x and compare
    xs = hard[:, 0]
    mid = (xs.min() + xs.max()) / 2
    near = (xs < mid).sum()
    far = (xs >= mid).sum()
    hi, lo = max(near, far), max(min(near, far), 1)
    assert hi / lo > 1.3, "no measurable density gradient"
    # imbalance: structural classes dominate by >100x over the rarest
    # present class (real S3DIS's inverse-log-weight regime)
    hist = np.bincount(hl, minlength=13).astype(float)
    present = hist[hist > 0]
    assert present.max() / present.min() > 100

    bldg, bl = synth_rooms.synthetic_s3dis_building(
        np.random.RandomState(4), num_rooms=2, hard=True)
    # two rooms: x-extent roughly doubles a single room's
    assert bldg[:, 0].max() - bldg[:, 0].min() > 8.0
    blocks = synth_rooms.room_blocks(np.random.RandomState(5), 1,
                                     model="test", hard=True,
                                     rooms_per_scene=2, with_mins=True)
    assert len(blocks) >= 8
    for b in blocks:
        assert "block_min" in b and b["xyz"].shape[1] == 3

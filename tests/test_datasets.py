"""Per-dataset pipeline tests: S3DIS room prep, ScanNet scene prep,
Semantic3D block/context machinery, ModelNet cloud prep."""
import numpy as np

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

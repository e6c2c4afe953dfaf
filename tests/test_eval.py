"""Full-scene eval pipeline tests: block sweep -> interpolation -> IoU and
the Semantic3D .labels writer."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.eval import (eval_scene_probs,
                                             interpolate_to_dense,
                                             save_semantic3d_labels,
                                             scene_iou)


def test_eval_scene_probs_offsets(rng):
    """Block mins must place sampled points back into scene coordinates."""
    C = 4

    def apply_fn(params, xyz, feats, mask):
        return jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (xyz.shape[0], 1))

    blocks = []
    for bi in range(3):
        n = 32
        blocks.append({
            "xyz": rng.randn(n, 3).astype(np.float32) * 0.1,
            "feats": np.zeros((n, 1), np.float32),
            "mask": np.ones(n, bool),
            "block_min": np.array([bi * 10.0, 0, 0], np.float32),
        })
    xyz, probs = eval_scene_probs(apply_fn, None, blocks)
    assert xyz.shape == (96, 3) and probs.shape == (96, C)
    assert xyz[:, 0].max() > 19.0  # offsets applied


def test_interpolate_to_dense_native_and_device(rng):
    s = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    probs = rng.rand(500, 5).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    q = s[:100] + 1e-4  # queries essentially on support points

    for prefer_native in (True, False):
        out = interpolate_to_dense(s, probs, q, k=3, ratio=5000.0,
                                   prefer_native=prefer_native)
        # nearest support dominates: argmax must match
        np.testing.assert_array_equal(out.argmax(1), probs[:100].argmax(1))


def test_scene_iou_perfect():
    labels = np.array([0, 1, 2, 2, 1])
    res = scene_iou(labels, labels, 3)
    assert res["miou"] == 1.0 and res["oacc"] == 1.0


def test_semantic3d_labels_writer(tmp_path, rng):
    probs = rng.rand(50, 9).astype(np.float32)  # class 0 = unlabeled
    path = os.path.join(tmp_path, "scene.labels")
    preds = save_semantic3d_labels(path, probs)
    assert preds.min() >= 1  # class 0 never predicted
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 50
    np.testing.assert_array_equal([int(x) for x in lines], preds)
    # argmax excludes class 0 (interpolate_semantic3d_new.py:94-95)
    np.testing.assert_array_equal(preds, probs[:, 1:].argmax(1) + 1)


def test_rot_ensemble_frame_restoration(rng):
    """Each rotation arm's sampled points must come back in the ORIGINAL
    frame (inverse of the prep-side z-rotation), and a rotation-invariant
    model must make the ensemble identical to the unrotated arm
    (semantic3d_test_to_block_with_rotate, semantic3d_util.py:539-557)."""
    from pointcloudsegmentation_tpu.data.augment import rotate_z
    from pointcloudsegmentation_tpu.eval import eval_rot_ensemble_probs

    C = 4
    n = 64

    def apply_fn(params, xyz, feats, mask):
        # rotation-invariant: logits from feats only
        return jnp.tile(feats[:, :1], (1, C)) * jnp.arange(1, C + 1)

    blocks = []
    for bi in range(2):
        blocks.append({
            "xyz": rng.rand(n, 3).astype(np.float32) * 3.0,
            "feats": rng.rand(n, 1).astype(np.float32),
            "mask": np.ones(n, bool),
            "block_min": np.array([bi * 3.0, 0, 0], np.float32),
        })

    def rot_arm(ang):
        out = []
        for b in blocks:
            absolute = rotate_z(np.ascontiguousarray(
                b["xyz"] + b["block_min"]), ang)
            bmin = absolute.min(0)
            nb = dict(b)
            nb["xyz"] = absolute - bmin
            nb["block_min"] = bmin
            out.append(nb)
        return out

    ang = np.pi / 12.0
    arms = [(0.0, blocks), (ang, rot_arm(ang))]
    (s0, p0), (s1, p1) = list(
        eval_rot_ensemble_probs(apply_fn, None, arms))
    # same points, same order, restored to the original frame
    np.testing.assert_allclose(s1, s0, atol=1e-4)
    # rotation-invariant model -> identical probs across arms
    np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-6)


def test_rot_ensemble_averages_probs(rng):
    """With a rotation-SENSITIVE model, the ensemble output is the mean of
    the per-arm interpolations (the 'avg' the reference's test_block_avg
    flow feeds into eval)."""
    from pointcloudsegmentation_tpu.eval import eval_rot_ensemble_probs

    C = 3
    n = 48

    def apply_fn(params, xyz, feats, mask):
        # local-frame-dependent logits: arms disagree
        return jnp.stack([xyz[:, 0], xyz[:, 1], xyz[:, 2]], axis=-1)

    block = {
        "xyz": rng.rand(n, 3).astype(np.float32),
        "feats": np.zeros((n, 1), np.float32),
        "mask": np.ones(n, bool),
        "block_min": np.zeros(3, np.float32),
    }
    from pointcloudsegmentation_tpu.data.augment import rotate_z
    ang = np.pi / 6.0
    absolute = rotate_z(np.ascontiguousarray(block["xyz"]), ang)
    bmin = absolute.min(0)
    rot_block = dict(block, xyz=absolute - bmin, block_min=bmin)

    arms = [(0.0, [block]), (ang, [rot_block])]
    outs = list(eval_rot_ensemble_probs(apply_fn, None, arms))
    dense = block["xyz"][:16]
    qs = [interpolate_to_dense(s, p, dense, k=3, ratio=500.0,
                               prefer_native=False) for s, p in outs]
    assert not np.allclose(qs[0], qs[1])  # arms genuinely disagree
    avg = (qs[0] + qs[1]) / 2.0
    # the CLI's run_scene computes exactly this mean
    np.testing.assert_allclose(avg, np.mean(qs, axis=0), rtol=1e-6)

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

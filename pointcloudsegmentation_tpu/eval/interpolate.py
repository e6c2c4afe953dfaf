"""Full-scene inference: block-sweep forward passes + Gaussian k-NN
probability interpolation back to full resolution + IoU / Semantic3D
``.labels`` submission writer.

Rebuilds the reference eval scripts (interpolate.py:121-190,
interpolate_semantic3d_new.py:46-128): restore params, run per-block softmax
probs, concatenate sampled points offset by their block mins, interpolate to
the dense cloud, argmax (excluding class 0 for Semantic3D submissions).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interpolate as interp_ops
from ..train.metrics import iou_from_confusion

# Reference Gaussian ratios: S3DIS 6-NN 1/(2·0.075²) (interpolate.py:140),
# Semantic3D 8-NN 1/(2·0.125²) (interpolate_semantic3d_new.py:88).
S3DIS_RATIO = 1.0 / (2 * 0.075 * 0.075)
SEMANTIC3D_RATIO = 1.0 / (2 * 0.125 * 0.125)


def eval_scene_probs(apply_fn: Callable, params, blocks: Iterable[Dict],
                     rng: Optional[jax.Array] = None,
                     extra_keys: Tuple[str, ...] = ()
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-block forward -> accumulated (xyz_global, probs) of all sampled
    points (eval_room_probs, interpolate.py:121-132).

    blocks: dicts with xyz [N,3], feats, mask [N], block_min [3] — plus any
    per-pipeline extras (ctx_*/dense_*) consumed by ``extra_keys``.
    apply_fn(params, xyz, feats, mask, *extras) -> logits [N, C] (or
    [2, N, C] for the refine cascade — the refine row is used, matching
    train_graph_pool_refine.py's eval of the refined classifier).
    """
    all_xyz, dev_probs, masks = [], [], []
    # dispatch the whole sweep WITHOUT per-block host syncs (a per-block
    # np.asarray would serialize the async dispatch pipeline and bill the
    # device-dispatch/readback latency to every block — the same discipline
    # as train/loop.run_epoch); probs come back in one drain below
    for b in blocks:
        extras = [b[k] for k in extra_keys]
        logits = apply_fn(params, b["xyz"], b["feats"], b["mask"], *extras)
        if logits.ndim == 3:  # refine cascade: (refine, base) stacked
            logits = logits[0]
        dev_probs.append(jax.nn.softmax(logits, axis=-1))
        m = np.asarray(b["mask"])
        masks.append(m)
        xyz = np.asarray(b["xyz"])[m] + np.asarray(
            b.get("block_min", np.zeros(3, np.float32)))[None, :]
        all_xyz.append(xyz)
    all_probs = [np.asarray(p)[m] for p, m in zip(dev_probs, masks)]
    return (np.concatenate(all_xyz, 0).astype(np.float32),
            np.concatenate(all_probs, 0).astype(np.float32))


def eval_rot_ensemble_probs(apply_fn: Callable, params,
                            arms: Iterable[Tuple[float, Iterable[Dict]]],
                            extra_keys: Tuple[str, ...] = ()
                            ) -> Iterable[Tuple[np.ndarray, np.ndarray]]:
    """Test-time rotation ensemble: run each rotation arm's block sweep and
    map its sampled points back into the ORIGINAL frame.

    The reference generates k·pi/12-rotated test-block variants
    (semantic3d_test_to_block_with_rotate, semantic3d_util.py:539-557) whose
    prep rotated the whole scan's absolute coordinates before block cutting,
    so each arm's reconstructed xyz (block xyz + block_min) lives in the
    rotated absolute frame; the inverse z-rotation restores the original
    frame exactly.  ``arms``: (rot_ang, blocks) pairs — rot_ang is the angle
    the PREP applied (0.0 for the unrotated arm).

    Yields one (sxyz_original_frame, probs) per arm; the caller interpolates
    each onto the dense cloud and averages (scripts/interpolate.py).
    """
    from ..data.augment import rotate_z

    for rot_ang, blocks in arms:
        sxyz, probs = eval_scene_probs(apply_fn, params, blocks,
                                       extra_keys=extra_keys)
        if rot_ang != 0.0:
            sxyz = rotate_z(np.ascontiguousarray(sxyz, np.float32),
                            -rot_ang)
        yield sxyz, probs


def interpolate_to_dense(sxyz: np.ndarray, sprobs: np.ndarray,
                         qxyz: np.ndarray, k: int = 6,
                         ratio: float = S3DIS_RATIO,
                         chunk: int = 200_000,
                         prefer_native: Optional[bool] = None) -> np.ndarray:
    """Gaussian k-NN interpolation of probs onto the dense cloud, chunked
    over queries (the reference loops 1M-point chunks,
    interpolate.py:156-168).

    Backend choice (``prefer_native=None`` = auto): the native hash-grid
    k-NN wins whenever it is available — measured 0.59 s vs 4.9 s device
    for 262k queries / 65k support on the r5 host: the device arm's exact
    top-k over the support axis dominates even tiled (ops/search._tiled_top_k)
    because TPU sorts are expensive per element, while the hash grid visits
    ~10² candidates per query.  The device kernel remains the fallback for
    toolchain-less hosts and the in-graph consumer (ops.interpolate).
    """
    from ..data import native

    if prefer_native is None:
        prefer_native = True
    if prefer_native and native.available():
        return native.interpolate_probs(sxyz, sprobs, qxyz, k, ratio,
                                        cell_hint=0.3)
    outs = []
    smask = jnp.ones(len(sxyz), bool)
    sxyz_d = jnp.asarray(sxyz)
    sprobs_d = jnp.asarray(sprobs)
    for beg in range(0, len(qxyz), chunk):
        q = jnp.asarray(qxyz[beg:beg + chunk])
        outs.append(interp_ops.interpolate_probs(
            sxyz_d, smask, sprobs_d, q,
            jnp.ones(len(q), bool), k=k, ratio=ratio))
    return np.concatenate([np.asarray(o) for o in outs], 0)


def scene_iou(labels: np.ndarray, preds: np.ndarray,
              num_classes: int) -> Dict:
    cm = np.zeros((num_classes, num_classes), np.float64)
    np.add.at(cm, (labels.astype(np.int64), preds.astype(np.int64)), 1.0)
    return iou_from_confusion(cm)


def save_semantic3d_labels(path: str, probs: np.ndarray) -> np.ndarray:
    """Write a Semantic3D server submission: argmax over classes 1..C
    (class 0 = unlabeled is excluded), one 1-based label per line
    (save_results, interpolate_semantic3d_new.py:92-111)."""
    preds = np.argmax(probs[:, 1:], axis=1) + 1
    with open(path, "w") as f:
        f.write("\n".join(str(int(p)) for p in preds))
        f.write("\n")
    return preds

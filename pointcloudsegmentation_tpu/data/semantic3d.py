"""Semantic3D dataset pipeline (reference: data_util.py:50-613,
semantic3d_util.py:10-600, semantic3d_context_util.py).

The heaviest offline pipeline of the reference: raw ``.txt`` scans
(x y z intensity r g b + ``.labels``) -> big-block partition (80 m blocks at
0.03 m downsample) -> 10 m training blocks with rotation augmentation ->
per-block pkls.  8 classes + class 0 = unlabeled (ignored in training,
excluded from submissions).

The context branch (50 m context clouds at 5 m average downsample with
per-point context indices, semantic3d_context_util.py:110-333) is provided
as ``context_cloud`` / ``context_indices``.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import augment

NUM_CLASSES = 8  # man-made terrain .. cars (class 0 = unlabeled, ignored)


def read_points_txt(path: str, labels_path: Optional[str] = None,
                    chunk: int = 2_000_000
                    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Stream a Semantic3D .txt scan (x y z i r g b per line) into arrays
    (read_semantic3d_points_file, data_util.py:50-80)."""
    pts = []
    with open(path) as f:
        rows = np.loadtxt(f, dtype=np.float32, ndmin=2)
    pts = rows  # columns: x y z intensity r g b
    labels = None
    if labels_path and os.path.exists(labels_path):
        labels = np.loadtxt(labels_path, dtype=np.int32)
    return pts, labels


def to_big_blocks(points: np.ndarray, labels: Optional[np.ndarray],
                  block_size: float = 80.0, ds_stride: float = 0.03
                  ) -> List[Dict]:
    """Partition a scan into macro blocks with grid downsample
    (semantic3d_to_block, semantic3d_util.py:136-178)."""
    xyz = points[:, :3]
    mins = xyz.min(0)
    bx = np.floor((xyz[:, 0] - mins[0]) / block_size).astype(np.int64)
    by = np.floor((xyz[:, 1] - mins[1]) / block_size).astype(np.int64)
    key = bx * 10000 + by
    out = []
    for k in np.unique(key):
        sel = np.nonzero(key == k)[0]
        sub = points[sel]
        keep = augment.grid_downsample(sub[:, :3], ds_stride)
        blk = {"points": sub[keep]}
        if labels is not None:
            blk["labels"] = labels[sel][keep]
        out.append(blk)
    return out


def sample_training_blocks(points: np.ndarray, labels: np.ndarray,
                           block_size: float = 10.0, stride: float = 5.0,
                           ds_stride: float = 0.06, min_pn: int = 1024,
                           rng: Optional[np.random.RandomState] = None,
                           rotate: bool = True,
                           covar_nn_size: float = 0.3) -> List[Dict]:
    """10 m training blocks with optional rotation augmentation
    (semantic3d_sample_single_file_training_block,
    semantic3d_util.py:279-295).  Features: rgb + intensity + covars."""
    rng = rng or np.random.RandomState()
    xyz = np.ascontiguousarray(points[:, :3], np.float32)
    intensity = points[:, 3:4].astype(np.float32)
    rgb = points[:, 4:7].astype(np.float32)

    if rotate and rng.rand() > 0.3:
        xyz = augment.rotate_z(xyz, rng.rand() * np.pi / 2.0)

    ds_idx = augment.grid_downsample(xyz, ds_stride)
    covars = augment.compute_covars(xyz, covar_nn_size, ds_idx)
    xyz_s, rgb_s = xyz[ds_idx], rgb[ds_idx]
    int_s, lbl_s = intensity[ds_idx], labels[ds_idx]

    rel = xyz_s - xyz_s.min(0, keepdims=True)
    crops = augment.uniform_sample_block(rel, block_size, stride,
                                         min_pn=min_pn)
    blocks = []
    for c in crops:
        x = xyz_s[c]
        mn = x.min(0, keepdims=True).copy()
        mn[:, :2] += block_size / 2.0
        # intensity standardized, rgb to [-1,1]
        # (normalize_block_hierarchy, aug_util.py:425-450)
        it = int_s[c]
        it = (it - it.mean()) / (it.std() + 1e-6)
        feats = np.concatenate(
            [rgb_s[c] / 127.5 - 1.0, it, covars[c]], 1).astype(np.float32)
        blocks.append({"xyz": (x - mn).astype(np.float32), "feats": feats,
                       "labels": lbl_s[c].astype(np.int32),
                       "block_min": mn[0].astype(np.float32)})
    return blocks


def compute_offset_z(points: np.ndarray, bin_size: float = 0.1,
                     z_range: float = 20.0) -> float:
    """Dominant ground-plane height of a scan: the mode of the z histogram
    (0.1 m bins over 20 m) plus the minimum z
    (semantic3d_sample_trainset_offset_z, semantic3d_util.py:10-55)."""
    zs = points[:, 2].astype(np.float64)
    min_z = zs.min()
    hist, _ = np.histogram(zs - min_z, np.arange(0.0, z_range, bin_size))
    return float(np.argmax(hist) * bin_size + min_z)


def write_offset_z_map(path: str, stem_points) -> Dict[str, float]:
    """Write the per-scan z-offset map consumed by the training-block
    sampler (cached/semantic3d_train_offsetz.txt,
    semantic3d_util.py:18-46).  ``stem_points``: iterable of
    (stem, points [n,>=3])."""
    out = {}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for stem, pts in stem_points:
            off = compute_offset_z(np.asarray(pts))
            out[stem] = off
            f.write(f"{stem} {off}\n")
    return out


def read_offset_z_map(path: str) -> Dict[str, float]:
    """semantic3d_read_map_offset_z (semantic3d_util.py:49-58)."""
    out = {}
    with open(path) as f:
        for line in f:
            stem, off = line.strip().split(" ")
            out[stem] = float(off)
    return out


def presample_test_blocks(points: np.ndarray,
                          block_size: float = 50.0, stride: float = 45.0,
                          ds_stride: float = 0.03, min_pn: int = 128
                          ) -> List[np.ndarray]:
    """Test-set presample: split a scan into overlapping 50 m macro blocks
    at 0.03 m downsample, NO augmentation
    (semantic3d_testset_presample_block, semantic3d_util.py:466-481).
    Returns a list of [n, 7] point arrays (xyz i r g b, absolute coords)."""
    xyz = np.ascontiguousarray(points[:, :3], np.float32)
    keep = augment.grid_downsample(xyz, ds_stride)
    pts = points[keep]
    rel = pts[:, :3] - pts[:, :3].min(0, keepdims=True)
    crops = augment.uniform_sample_block(rel, block_size, stride,
                                         min_pn=min_pn)
    return [pts[c] for c in crops]


def process_test_blocks(points: np.ndarray,
                        rot_ang: float = 0.0,
                        block_size: float = 10.0, stride: float = 2.5,
                        ds_stride: float = 0.06,
                        covar_nn_size: float = 0.3,
                        min_pn: int = 128) -> List[Dict]:
    """Deterministic 10 m eval blocks of one presampled macro block, with an
    optional z-rotation for the test-time rotation ensemble
    (semantic3d_process_test_block[_with_rotate],
    semantic3d_util.py:483-521; rotations k·pi/12, k=1..5 in
    semantic3d_test_to_block_with_rotate :539-557).  No flips/rescale/
    jitter; block_min carries absolute placement for re-assembly."""
    pts = np.asarray(points, np.float32)
    if rot_ang != 0.0:
        pts = pts.copy()
        pts[:, :3] = augment.rotate_z(
            np.ascontiguousarray(pts[:, :3]), rot_ang)
    return sample_training_blocks(pts, np.zeros(len(pts), np.int32),
                                  block_size=block_size, stride=stride,
                                  ds_stride=ds_stride, min_pn=min_pn,
                                  rng=np.random.RandomState(0),
                                  rotate=False,
                                  covar_nn_size=covar_nn_size)


def save_eval_scene(path: str, blocks: List[Dict]) -> None:
    """Write the columnar per-scene eval layout consumed by
    scripts/interpolate.py — the analog of the reference's
    ``test_block_avg`` pkls (interpolate_semantic3d_new.py:68-90:
    (xyzs, rgbs, covars, lbls, block_mins) lists per scene).  Features
    (rgb+intensity+covars) ride in the ``rgbs`` column."""
    import pickle as _pickle

    data = {"xyzs": [b["xyz"] for b in blocks],
            "rgbs": [b["feats"] for b in blocks],
            "lbls": [b["labels"] for b in blocks],
            "block_mins": [b["block_min"] for b in blocks]}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        _pickle.dump(data, f, protocol=_pickle.HIGHEST_PROTOCOL)


def context_cloud(points: np.ndarray, ds_size: float = 5.0) -> np.ndarray:
    """Global average-downsampled context cloud (global_avg_downsample,
    semantic3d_context_util.py:110-153): mean xyz+feats per 5 m voxel."""
    xyz = points[:, :3]
    mins = xyz.min(0, keepdims=True)
    coords = np.floor((xyz - mins) / ds_size).astype(np.int64)
    dims = coords.max(0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    order = np.argsort(key, kind="stable")
    skey = key[order]
    boundaries = np.concatenate([[0], np.nonzero(np.diff(skey))[0] + 1,
                                 [len(skey)]])
    out = np.empty((len(boundaries) - 1, points.shape[1]), np.float32)
    for vi in range(len(boundaries) - 1):
        seg = order[boundaries[vi]:boundaries[vi + 1]]
        out[vi] = points[seg].mean(0)
    return out


def context_indices(block_xyz: np.ndarray, ctx_xyz: np.ndarray
                    ) -> np.ndarray:
    """Nearest context point per block point (compute_context_idxs,
    semantic3d_context_util.py:322-333)."""
    from . import native

    if native.available():
        idx, _ = native.knn(ctx_xyz, block_xyz, 1, cell_hint=5.0)
        return idx[:, 0].astype(np.int32)
    d2 = ((block_xyz[:, None, :] - ctx_xyz[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1).astype(np.int32)


def prepare_context_scene(points: np.ndarray, labels: np.ndarray,
                          block_size: float = 10.0, stride: float = 5.0,
                          ds_stride: float = 0.06, ctx_ds: float = 5.0,
                          ctx_block: float = 50.0, min_pn: int = 1024,
                          rng: Optional[np.random.RandomState] = None,
                          rotate: bool = True,
                          covar_nn_size: float = 0.3) -> List[Dict]:
    """Scan -> 10 m training blocks EACH PAIRED with its 50 m context
    sub-cloud and per-point nearest-context indices — the offline context
    prep (semantic3d_context_util.py:578-583 sample_context_block fan-out).

    The optional z-rotation is applied to the WHOLE scan before both the
    block sampler and the context downsample, so block and context stay in
    one rigid frame; ctx_xyz is stored block-relative (same origin as the
    block's xyz), ready for ContextFusionModel.
    """
    rng = rng or np.random.RandomState()
    pts = np.asarray(points, np.float32)
    if rotate and rng.rand() > 0.3:
        pts = pts.copy()
        pts[:, :3] = augment.rotate_z(
            np.ascontiguousarray(pts[:, :3]), rng.rand() * np.pi / 2.0)
    blocks = sample_training_blocks(pts, labels, block_size=block_size,
                                    stride=stride, ds_stride=ds_stride,
                                    min_pn=min_pn, rng=rng, rotate=False,
                                    covar_nn_size=covar_nn_size)
    ctx = context_cloud(pts, ctx_ds)            # [m, 7] mean x y z i r g b
    ctx_abs = ctx[:, :3]
    it = ctx[:, 3:4]
    it = (it - it.mean()) / (it.std() + 1e-6)
    ctx_feats_all = np.concatenate([ctx[:, 4:7] / 127.5 - 1.0, it],
                                   1).astype(np.float32)
    for b in blocks:
        mn = b["block_min"]
        rel = ctx_abs - mn[None, :]
        sel = (np.abs(rel[:, 0]) <= ctx_block / 2.0) \
            & (np.abs(rel[:, 1]) <= ctx_block / 2.0)
        if not sel.any():                        # degenerate scan: keep the
            sel = np.zeros(len(rel), bool)       # nearest voxel so the
            sel[np.argmin((rel[:, :2] ** 2).sum(1))] = True  # gather works
        cx = rel[sel].astype(np.float32)
        b["ctx_xyz"] = cx
        b["ctx_feats"] = ctx_feats_all[sel]
        b["ctx_idx"] = context_indices(b["xyz"], cx)
    return blocks


def context_blocks_from_pkl(model: str, filename: str,
                            rng: Optional[np.random.RandomState] = None
                            ) -> List[Dict]:
    """Provider read_fn for context-block pkls
    (train_gpn_semantic3d_context.py:50-71 feed): train-time flips are
    applied to block AND context cloud together (one rigid frame — the
    nearest-context relation is mirror-invariant), color jitter on the
    block features only."""
    rng = rng or np.random.RandomState()
    with open(filename, "rb") as f:
        blocks = pickle.load(f)
    out = []
    for b in blocks:
        xyz, feats = b["xyz"], b["feats"]
        cx, cf = b["ctx_xyz"], b["ctx_feats"]
        if model == "train":
            if rng.rand() < 0.5:
                xyz = augment.flip(xyz, 0)
                cx = augment.flip(cx, 0)
            if rng.rand() < 0.5:
                xyz = augment.flip(xyz, 1)
                cx = augment.flip(cx, 1)
            feats = feats.copy()
            feats[:, :3] += rng.uniform(-0.02, 0.02, (len(feats), 3))
        out.append({"xyz": xyz.astype(np.float32),
                    "feats": feats.astype(np.float32),
                    "labels": b["labels"].astype(np.int32),
                    "ctx_xyz": cx.astype(np.float32),
                    "ctx_feats": cf.astype(np.float32),
                    "ctx_idx": np.asarray(b["ctx_idx"], np.int32)})
    return out


def save_blocks(path: str, blocks: List[Dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(blocks, f, protocol=pickle.HIGHEST_PROTOCOL)


def dense_blocks_from_pkl(model: str, filename: str,
                          sample_stride: float = 0.25,
                          rng: Optional[np.random.RandomState] = None
                          ) -> List[Dict]:
    """Provider read_fn for the dense pipeline
    (semantic3d_dense_util.py:10-97, train_gpn_semantic3d_dense.py:52-65):
    each block yields the DENSE cloud (``dense_*`` fields) plus the
    grid-downsampled SAMPLED subset that carries labels and flows through
    the pyramid; the model builds the fixed-K dense->sampled graph on
    device (models/dense.DenseFeats)."""
    blocks = blocks_from_pkl(model, filename, rng)
    out = []
    for b in blocks:
        keep = augment.grid_downsample(b["xyz"], sample_stride)
        out.append({"xyz": b["xyz"][keep], "feats": b["feats"][keep],
                    "labels": b["labels"][keep],
                    "dense_xyz": b["xyz"], "dense_feats": b["feats"]})
    return out


def blocks_from_pkl(model: str, filename: str,
                    rng: Optional[np.random.RandomState] = None
                    ) -> List[Dict]:
    rng = rng or np.random.RandomState()
    with open(filename, "rb") as f:
        blocks = pickle.load(f)
    out = []
    for b in blocks:
        xyz, feats = b["xyz"], b["feats"]
        if model == "train":
            if rng.rand() < 0.5:
                xyz = augment.flip(xyz, 0)
            if rng.rand() < 0.5:
                xyz = augment.flip(xyz, 1)
            feats = feats.copy()
            feats[:, :3] += rng.uniform(-0.02, 0.02, (len(feats), 3))
        out.append({"xyz": xyz.astype(np.float32),
                    "feats": feats.astype(np.float32),
                    "labels": b["labels"].astype(np.int32)})
    return out

"""Offline dataset preparation CLI — the analog of the reference's prep
mains (s3dis_util.py:140-241 prepare_*, semantic3d_util.py multiprocess
block writers, data_util.prepare_semantic3d, modelnet prep).

Inputs are raw per-room/per-scene files; outputs are the sampled-block pkls
the training CLI consumes.

  # S3DIS: rooms as pkls of (points [n,6] xyz+rgb, labels [n])
  python scripts/prepare_data.py s3dis --raw-dir data/rooms \
      --out-dir data/S3DIS/sampled_train --workers 8

  # Semantic3D: .txt scans (+ .labels) -> 10 m training-block pkls
  python scripts/prepare_data.py semantic3d --raw-dir data/sem3d \
      --out-dir data/Semantic3D/blocks --workers 8

  # ModelNet40: pkls of [(xyz, label), ...] -> normalized+covar clouds
  python scripts/prepare_data.py modelnet40 --raw-dir data/modelnet \
      --out-dir data/ModelNet40/prepared
"""
from __future__ import annotations

import argparse
import glob
import multiprocessing as mp
import os
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pointcloudsegmentation_tpu.data import io_util, s3dis, semantic3d
from pointcloudsegmentation_tpu.utils.logging import get_logger

log = get_logger("pcs_tpu.prepare")


def prep_s3dis_one(out_dir, augment_geometry, path):
    points, labels = io_util.read_room_pkl(path)
    room = s3dis.prepare_room(points, labels,
                              rng=np.random.RandomState(hash(path) % 2**31),
                              augment_geometry=augment_geometry)
    out = os.path.join(out_dir, os.path.basename(path))
    s3dis.save_pkl(out, room)
    return out, len(room["xyzs"])


def prep_semantic3d_one(out_dir, path):
    labels_path = os.path.splitext(path)[0] + ".labels"
    points, labels = semantic3d.read_points_txt(path, labels_path)
    if labels is None:
        labels = np.zeros(len(points), np.int32)
    blocks = semantic3d.sample_training_blocks(
        points, labels, rng=np.random.RandomState(hash(path) % 2**31))
    stem = os.path.splitext(os.path.basename(path))[0]
    out = os.path.join(out_dir, stem + ".pkl")
    semantic3d.save_blocks(out, blocks)
    return out, len(blocks)


def prep_semantic3d_context_one(out_dir, path):
    """Scan -> context-paired 10 m block pkls (the reference's multiprocess
    context fan-out, semantic3d_context_util.py:578-583)."""
    labels_path = os.path.splitext(path)[0] + ".labels"
    points, labels = semantic3d.read_points_txt(path, labels_path)
    if labels is None:
        labels = np.zeros(len(points), np.int32)
    blocks = semantic3d.prepare_context_scene(
        points, labels, rng=np.random.RandomState(hash(path) % 2**31))
    stem = os.path.splitext(os.path.basename(path))[0]
    out = os.path.join(out_dir, stem + ".pkl")
    semantic3d.save_blocks(out, blocks)
    return out, len(blocks)


def prep_scannet_one(out_dir, augment_geometry, path):
    """Per-scene pkl of (xyz [n,3], labels [n]) -> cropped no-RGB blocks +
    per-scene label counts (scannet_data_util.py:19-179)."""
    from pointcloudsegmentation_tpu.data import scannet

    data = io_util.read_pkl(path)
    xyz, labels = np.asarray(data[0], np.float32), np.asarray(data[1],
                                                              np.int32)
    scene = scannet.prepare_scene(
        xyz, labels, rng=np.random.RandomState(hash(path) % 2**31),
        augment_geometry=augment_geometry)
    out = os.path.join(out_dir, os.path.basename(path))
    io_util.save_pkl(out, scene)
    counts = np.bincount(
        np.concatenate([np.ravel(l) for l in scene["lbls"]]),
        minlength=scannet.NUM_CLASSES + 1)
    np.save(out + ".counts.npy", counts)
    return out, len(scene["xyzs"])


def prep_semantic3d_test_one(out_dir, rotations, path):
    """Test scan -> presampled 50 m macro blocks -> deterministic 10 m eval
    blocks in the columnar per-scene layout scripts/interpolate.py reads
    (semantic3d_testset_presample_block + semantic3d_test_to_block
    [+_with_rotate], semantic3d_util.py:466-557)."""
    points, _ = semantic3d.read_points_txt(path)
    stem = os.path.splitext(os.path.basename(path))[0]
    macro = semantic3d.presample_test_blocks(points)
    outs = []
    for ri in range(rotations + 1):
        rot = np.pi / 12.0 * ri
        blocks = []
        for m in macro:
            blocks.extend(semantic3d.process_test_blocks(m, rot_ang=rot))
        sub = "test" if ri == 0 else f"test_{ri}"
        out = os.path.join(out_dir, sub, stem + ".pkl")
        semantic3d.save_eval_scene(out, blocks)
        outs.append(out)
    return outs[0], sum(1 for _ in outs)


def prep_modelnet_one(out_dir, path):
    from pointcloudsegmentation_tpu.data import modelnet

    items = io_util.read_pkl(path)
    prepared = [(modelnet.prepare_cloud(np.asarray(x, np.float32), int(l)),
                 int(l)) for x, l in items]
    out = os.path.join(out_dir, os.path.basename(path))
    io_util.save_pkl(out, prepared)
    return out, len(prepared)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset", choices=["s3dis", "scannet", "semantic3d",
                                       "semantic3d_context",
                                       "semantic3d_test", "modelnet40"])
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--workers", type=int, default=max(1, os.cpu_count() - 2))
    p.add_argument("--augment-geometry", action="store_true",
                   help="offline flips/rescale/rotate (the reference's "
                        "sampled_train with-aug variant)")
    p.add_argument("--rotations", type=int, default=0,
                   help="semantic3d_test: also write k*pi/12-rotated eval "
                        "variants (semantic3d_test_to_block_with_rotate, "
                        "up to 5)")
    p.add_argument("--offset-z-map", type=str, default=None,
                   help="semantic3d: also write the per-scan z-offset map "
                        "(semantic3d_train_offsetz.txt)")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    pattern = ("*.txt" if args.dataset.startswith("semantic3d")
               else "*.pkl")
    files = sorted(glob.glob(os.path.join(args.raw_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} in {args.raw_dir}")
    fn = {"s3dis": partial(prep_s3dis_one, args.out_dir,
                           args.augment_geometry),
          "scannet": partial(prep_scannet_one, args.out_dir,
                             args.augment_geometry),
          "semantic3d": partial(prep_semantic3d_one, args.out_dir),
          "semantic3d_context": partial(prep_semantic3d_context_one,
                                        args.out_dir),
          "semantic3d_test": partial(prep_semantic3d_test_one, args.out_dir,
                                     args.rotations),
          "modelnet40": partial(prep_modelnet_one, args.out_dir)}[
        args.dataset]

    if args.dataset == "semantic3d" and args.offset_z_map:
        def _iter():
            for f in files:
                pts, _ = semantic3d.read_points_txt(f)
                yield os.path.splitext(os.path.basename(f))[0], pts
        semantic3d.write_offset_z_map(args.offset_z_map, _iter())
        log.info("wrote z-offset map %s", args.offset_z_map)

    # multiprocess fan-out (the reference's multiprocessing.Pool pattern,
    # semantic3d_util.py:279-295)
    if args.workers > 1:
        with mp.Pool(args.workers) as pool:
            for out, n in pool.imap_unordered(fn, files):
                log.info("%s: %d blocks", out, n)
    else:
        for f in files:
            out, n = fn(f)
            log.info("%s: %d blocks", out, n)

    if args.dataset == "scannet":
        # aggregate per-scene label counts -> training class weights
        # (cached/scannet_weights.txt, scannet_data_util.py:160-179)
        from pointcloudsegmentation_tpu.data import scannet

        counts = sum(np.load(f) for f in
                     glob.glob(os.path.join(args.out_dir, "*.counts.npy")))
        # drop the unannotated class 0 (masked from the loss)
        weights = scannet.class_weights_from_counts(counts[1:])
        wpath = os.path.join(args.out_dir, "scannet_weights.txt")
        np.savetxt(wpath, weights)
        log.info("wrote class weights %s", wpath)


if __name__ == "__main__":
    main()

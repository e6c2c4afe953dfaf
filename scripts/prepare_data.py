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
    p.add_argument("dataset", choices=["s3dis", "semantic3d", "modelnet40"])
    p.add_argument("--raw-dir", required=True)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--workers", type=int, default=max(1, os.cpu_count() - 2))
    p.add_argument("--augment-geometry", action="store_true",
                   help="offline flips/rescale/rotate (the reference's "
                        "sampled_train with-aug variant)")
    args = p.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    pattern = "*.txt" if args.dataset == "semantic3d" else "*.pkl"
    files = sorted(glob.glob(os.path.join(args.raw_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} in {args.raw_dir}")
    fn = {"s3dis": partial(prep_s3dis_one, args.out_dir,
                           args.augment_geometry),
          "semantic3d": partial(prep_semantic3d_one, args.out_dir),
          "modelnet40": partial(prep_modelnet_one, args.out_dir)}[
        args.dataset]

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


if __name__ == "__main__":
    main()

"""Full-scene inference CLI — the analog of the reference's
``interpolate*.py`` family (interpolate.py, interpolate_semantic3d_new.py,
interpolate_scannet_new.py):

restore a checkpoint -> per-block forward probs -> Gaussian k-NN
interpolation to the full-resolution cloud -> IoU (labeled data) and/or
Semantic3D ``.labels`` submission files.

Usage (S3DIS rooms prepared with data.s3dis.prepare_room):
  python scripts/interpolate.py --config s3dis --checkpoint-dir model/ \
      --scene-dir data/rooms --out-dir results/
Synthetic self-check (no data needed):
  python scripts/interpolate.py --config s3dis --synthetic
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from pointcloudsegmentation_tpu.data import io_util, s3dis, toy
from pointcloudsegmentation_tpu.data.batching import pad_block
from pointcloudsegmentation_tpu.eval import (S3DIS_RATIO, SEMANTIC3D_RATIO,
                                             eval_rot_ensemble_probs,
                                             eval_scene_probs,
                                             interpolate_to_dense,
                                             save_semantic3d_labels,
                                             scene_iou)
from pointcloudsegmentation_tpu.train import Trainer
from pointcloudsegmentation_tpu.train.checkpoint import CheckpointManager
from pointcloudsegmentation_tpu.train.cli import CONFIGS
from pointcloudsegmentation_tpu.utils.logging import get_logger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=sorted(CONFIGS), default="s3dis")
    p.add_argument("--model", type=str, default=None,
                   help="override the config's model registry key "
                        "(e.g. refine_s3dis, context_semantic3d, "
                        "dense_semantic3d)")
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--scene-dir", type=str, default=None,
                   help="dir of per-scene pkls (sampled blocks + dense pts)")
    p.add_argument("--out-dir", type=str, default="results")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-points", type=int, default=None,
                   help="override block size (small CPU self-checks)")
    p.add_argument("--knn", type=int, default=6)
    p.add_argument("--labels-out", action="store_true",
                   help="write Semantic3D .labels submissions")
    p.add_argument("--rot-ensemble", type=int, default=0, metavar="K",
                   help="test-time rotation ensemble over K extra k*pi/12-"
                        "rotated arms (semantic3d_test_to_block_with_rotate, "
                        "semantic3d_util.py:539-557).  Arm ri's blocks are "
                        "read from the sibling dir '<scene-dir>_<ri>' "
                        "(prepare_data.py semantic3d_test --rotations K "
                        "writes test/ + test_1/..test_K/); each arm's probs "
                        "are interpolated onto the dense cloud in the "
                        "original frame and AVERAGED")
    p.add_argument("--exact-search", action="store_true",
                   help="use the EXACT global neighbor search at eval "
                        "instead of the windowed training path.  MEASURED "
                        "WORSE at frozen params (scripts/eval_parity.py, "
                        "results/eval_parity.json: windowed 0.7796 vs "
                        "exact 0.7577 mean scene mIoU — the model adapts "
                        "to the search it trained with, so switching "
                        "searches at eval is a train/eval mismatch); kept "
                        "for diagnostics")
    p.add_argument("--fast-search", action="store_true",
                   help="deprecated no-op: the windowed training search "
                        "is now the eval default (see --exact-search)")
    args = p.parse_args()
    log = get_logger("pcs_tpu.interpolate")
    if args.exact_search:
        # read at trace time by ops.search.band_neighbors_auto — must be
        # set before the first model trace
        os.environ["PCS_DISABLE_WINDOWED"] = "1"
        log.info("exact-search eval (diagnostic arm; the windowed "
                 "training-matched search is the default and measured "
                 "MORE accurate at frozen params — eval_parity.json)")

    over = {}
    if args.model:
        over["model"] = args.model
    if args.num_points:
        over["data_num_points"] = args.num_points
        over["data_caps"] = (args.num_points // 2, args.num_points // 8)
    cfg = CONFIGS[args.config](**over)
    if cfg.model == "gpn_modelnet40":
        raise SystemExit("classification models have no dense cloud to "
                         "interpolate onto — use train CLI --eval instead")
    trainer = Trainer(cfg)
    rng = jax.random.PRNGKey(0)
    ratio = SEMANTIC3D_RATIO if args.config == "semantic3d" else S3DIS_RATIO
    os.makedirs(args.out_dir, exist_ok=True)

    d = cfg.data
    # apply-signature dispatch per pipeline, mirroring
    # Trainer._batched_logits (the reference's per-pipeline interpolate_*.py
    # scripts reuse their trainer's placeholder/fill fns the same way,
    # interpolate_scannet_new.py:1-45, interpolate_semantic3d_context.py)
    if cfg.model == "context_semantic3d":
        extra_keys = ("ctx_xyz", "ctx_feats", "ctx_mask", "ctx_idx")
    elif cfg.model == "dense_semantic3d":
        extra_keys = ("dense_xyz", "dense_feats", "dense_mask")
    else:
        extra_keys = ()
    apply_fn = jax.jit(lambda params, *args: trainer.model.apply(
        params, *args, False))

    def run_scene(name, arms, dense_xyz, dense_labels):
        """arms: [(rot_ang, blocks), ...] — arm 0 is the unrotated sweep.
        Each arm's probs are interpolated onto the dense cloud in the
        original frame; the ensemble average is the scene's qprobs."""
        qprobs = None
        sxyz = probs = None
        for sxyz, probs in eval_rot_ensemble_probs(
                apply_fn, state.params, arms, extra_keys=extra_keys):
            qp = interpolate_to_dense(sxyz, probs, dense_xyz, k=args.knn,
                                      ratio=ratio)
            qprobs = qp if qprobs is None else qprobs + qp
        qprobs = qprobs / len(arms)
        if args.labels_out:
            path = os.path.join(args.out_dir, f"{name}.labels")
            save_semantic3d_labels(path, qprobs)
            log.info("%s: wrote %s", name, path)
        if dense_labels is not None:
            res = scene_iou(dense_labels, qprobs.argmax(1), d.num_classes)
            log.info("%s: mIoU %.4f oAcc %.4f", name, res["miou"],
                     res["oacc"])
            return res
        return None

    def load_blocks(fn):
        data = io_util.read_pkl(fn)
        blocks = []
        for i in range(len(data["xyzs"])):
            pb = pad_block(data["xyzs"][i],
                           np.asarray(data["rgbs"][i], np.float32),
                           np.asarray(data["lbls"][i], np.int32),
                           d.num_points)
            pb["block_min"] = np.asarray(data["block_mins"][i], np.float32)
            for k in extra_keys:  # per-pipeline extras stored in the pkl
                key = k + "s"
                if key in data:
                    pb[k] = np.asarray(data[key][i])
            missing = [k for k in extra_keys if k not in pb]
            if missing:
                raise KeyError(f"scene pkl {fn} lacks {missing} required "
                               f"by model '{cfg.model}'")
            blocks.append(pb)
        return blocks

    if args.synthetic:
        # one synthetic "scene": blocks cut from a larger cloud
        rng_np = np.random.RandomState(0)
        blocks = []
        for i in range(4):
            blk = toy.synthetic_room_block(rng_np, n=d.num_points,
                                           num_classes=d.num_classes,
                                           feat_dim=max(d.feat_dim, 1))
            pb = pad_block(blk["xyz"], blk["feats"], blk["labels"],
                           d.num_points)
            pb["block_min"] = np.array([3.0 * i, 0, 0], np.float32)
            add_synthetic_extras(pb, extra_keys, rng_np)
            blocks.append(pb)
        dense_xyz = np.concatenate(
            [b["xyz"][b["mask"]] + b["block_min"] for b in blocks], 0)
        dense_labels = np.concatenate(
            [b["labels"][b["mask"]] for b in blocks], 0)
        # synthetic rotation arms: the prep-side rotation applied to the
        # whole scene before block cutting, emulated here by rotating each
        # block's absolute coordinates
        arms = [(0.0, blocks)]
        for ri in range(1, args.rot_ensemble + 1):
            ang = np.pi / 12.0 * ri
            arms.append((ang, [rotate_block(b, ang) for b in blocks]))
        state = trainer.init_state(rng, toy_batch(blocks))
        res = run_scene("synthetic", arms, dense_xyz, dense_labels)
        assert res is not None
        return res

    assert args.checkpoint_dir and args.scene_dir
    scene_files = sorted(glob.glob(os.path.join(args.scene_dir, "*.pkl")))
    results = []
    state = None
    for fn in scene_files:
        blocks = load_blocks(fn)
        if state is None:
            from pointcloudsegmentation_tpu.data.batching import stack_blocks
            state = trainer.init_state(rng, stack_blocks(blocks[:1]))
            ckpt = CheckpointManager(args.checkpoint_dir)
            state = ckpt.restore(state)
        arms = [(0.0, blocks)]
        base = os.path.basename(fn)
        for ri in range(1, args.rot_ensemble + 1):
            rfn = os.path.join(args.scene_dir.rstrip("/") + f"_{ri}", base)
            if not os.path.exists(rfn):
                raise FileNotFoundError(
                    f"rotation arm {ri} missing: {rfn} (run "
                    f"prepare_data.py semantic3d_test --rotations "
                    f"{args.rot_ensemble})")
            arms.append((np.pi / 12.0 * ri, load_blocks(rfn)))
        dense_xyz = np.concatenate(
            [b["xyz"][b["mask"]] + b["block_min"] for b in blocks], 0)
        dense_labels = np.concatenate(
            [b["labels"][b["mask"]] for b in blocks], 0)
        name = os.path.splitext(base)[0]
        results.append(run_scene(name, arms, dense_xyz, dense_labels))
    return results


def rotate_block(pb, ang):
    """Rotate one padded block's ABSOLUTE coordinates by ``ang`` about z —
    the synthetic stand-in for prep-side scene rotation (process_test_blocks
    rot_ang).  Local frame is re-anchored at the rotated min."""
    from pointcloudsegmentation_tpu.data.augment import rotate_z

    out = dict(pb)
    absolute = rotate_z(
        np.ascontiguousarray(pb["xyz"] + pb["block_min"], np.float32), ang)
    bmin = absolute[pb["mask"]].min(0) if pb["mask"].any() \
        else np.zeros(3, np.float32)
    out["xyz"] = (absolute - bmin).astype(np.float32)
    out["block_min"] = bmin.astype(np.float32)
    if "ctx_xyz" in pb:
        out["ctx_xyz"] = (rotate_z(np.ascontiguousarray(
            pb["ctx_xyz"] + pb["block_min"], np.float32), ang)
            - bmin).astype(np.float32)
    if "dense_xyz" in pb:
        out["dense_xyz"] = (rotate_z(np.ascontiguousarray(
            pb["dense_xyz"] + pb["block_min"], np.float32), ang)
            - bmin).astype(np.float32)
    return out


def add_synthetic_extras(pb, extra_keys, rng_np):
    """Attach synthetic ctx_*/dense_* arrays so the --synthetic self-check
    covers the context/dense pipelines too."""
    if "dense_xyz" in extra_keys:
        jit = rng_np.normal(0, 0.01, pb["xyz"].shape).astype(np.float32)
        pb["dense_xyz"] = pb["xyz"] + jit
        pb["dense_feats"] = pb["feats"].copy()
        pb["dense_mask"] = pb["mask"].copy()
    if "ctx_xyz" in extra_keys:
        n = pb["xyz"].shape[0]
        nc = max(n // 8, 1)
        sel = rng_np.choice(n, nc, replace=False)
        pb["ctx_xyz"] = pb["xyz"][sel]
        pb["ctx_feats"] = pb["feats"][sel]
        pb["ctx_mask"] = pb["mask"][sel]
        d2 = ((pb["xyz"][:, None, :] - pb["ctx_xyz"][None, :, :])
              ** 2).sum(-1)
        pb["ctx_idx"] = d2.argmin(1).astype(np.int32)


def toy_batch(blocks):
    from pointcloudsegmentation_tpu.data.batching import stack_blocks
    keys = ("xyz", "feats", "labels", "mask", "ctx_xyz", "ctx_feats",
            "ctx_mask", "ctx_idx", "dense_xyz", "dense_feats", "dense_mask")
    return stack_blocks([{k: b[k] for k in keys if k in b}
                         for b in blocks[:1]])


if __name__ == "__main__":
    main()

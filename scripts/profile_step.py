"""Capture a device trace of the flagship train step (utils.profiling.trace)
and print a per-phase wall-clock breakdown.

Usage: python scripts/profile_step.py [--logdir /tmp/pcs_trace]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.models import PointNetSegEncoder, S3DIS_ARCH
from pointcloudsegmentation_tpu.ops import hierarchy as hier
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config
from pointcloudsegmentation_tpu.utils import profiling


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default=None)
    p.add_argument("--num-points", type=int, default=8192)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    cfg = s3dis_config(data_num_points=args.num_points,
                       data_caps=(args.num_points // 2,
                                  args.num_points // 8), data_feat_dim=12)
    tr = Trainer(cfg, search_chunk=2048)
    rng = jax.random.PRNGKey(0)
    batch = next(toy.toy_batches(1, batch_size=args.batch,
                                 num_points=args.num_points, kind="room"))
    state = tr.init_state(rng, batch)
    dev_batch = jax.device_put(batch)

    # train_step donates the state: rebind it every call (a fixed-state
    # lambda would reuse a donated buffer and abort the TPU program)
    holder = {"state": state}

    def step(b):
        holder["state"], m = tr.train_step(holder["state"], b, rng)
        return m["loss"]

    step(dev_batch)
    print("full train step:", profiling.time_fn(step, dev_batch, iters=10))
    print("step w/ host batch:", profiling.time_fn(step, batch, iters=10))
    state = holder["state"]

    # phase breakdown (forward pieces)
    xyz, feats, mask = (jnp.asarray(batch["xyz"][0]),
                        jnp.asarray(batch["feats"][0]),
                        jnp.asarray(batch["mask"][0]))
    d = cfg.data
    pyr_fn = jax.jit(lambda x, mk: hier.build_pyramid(
        x, mk, d.voxel_sizes, d.caps, d.block_size))
    print("pyramid:", profiling.time_fn(pyr_fn, xyz, mask))
    pyr = pyr_fn(xyz, mask)
    enc = PointNetSegEncoder(arch=S3DIS_ARCH, search_chunk=2048)
    params = enc.init(jax.random.PRNGKey(0), pyr, feats)
    fwd = jax.jit(lambda p, py, f: enc.apply(p, py, f))
    print("encoder fwd (1 block):", profiling.time_fn(fwd, params, pyr,
                                                      feats))

    if args.logdir:
        with profiling.trace(args.logdir):
            for _ in range(3):
                state, m = tr.train_step(state, dev_batch, rng)
            jax.block_until_ready(m["loss"])
        print("trace written to", args.logdir)


if __name__ == "__main__":
    main()

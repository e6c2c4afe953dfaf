"""Benchmark harness: flagship S3DIS training throughput in points/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); its instrumentation logs
blocks/s on 4 GPUs (train_gpn_scannet_new.py:173-178).  vs_baseline is
computed against a documented estimate of the TF-CUDA reference on one V100:
~10 blocks/s × ~8k points/block = 8e4 points/s/GPU (see BASELINE.md).
"""
import json
import time

import jax
from jax import numpy as _jnp


def jnp_asarray(x):
    return _jnp.asarray(x)

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()
import numpy as np

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config

BASELINE_POINTS_PER_SEC = 8.0e4  # estimated TF-CUDA reference, 1x V100

import os
NUM_POINTS = int(os.environ.get("PCS_BENCH_POINTS", 8192))
BATCH = int(os.environ.get("PCS_BENCH_BATCH", 4))
CHUNK = int(os.environ.get("PCS_BENCH_CHUNK", 2048))
WARMUP = 3
ITERS = 20


def main():
    cfg = s3dis_config(data_num_points=NUM_POINTS,
                       data_caps=(4096, 1024),
                       data_feat_dim=12)
    trainer = Trainer(cfg, search_chunk=CHUNK)
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(2, batch_size=BATCH,
                                   num_points=NUM_POINTS, kind="room",
                                   num_classes=13, feat_dim=12))
    state = trainer.init_state(rng, batches[0])

    # device-resident batches: a real input pipeline prefetches to device
    # (data/provider double-buffers); feeding host numpy would bill a
    # ~40 ms H2D copy to every step
    batches = jax.device_put(batches)
    for i in range(WARMUP):
        state, m = trainer.train_step(state, batches[i % 2], rng)
    float(m["loss"])  # host readback: block_until_ready alone does not
    #                   reliably synchronize on the remote-TPU platform

    # time a CHAIN of steps with one final readback — training loops do not
    # synchronize per step, so per-step sync would bill the ~26 ms remote
    # dispatch+readback latency to every step.  Median of 3 chains guards
    # against TPU-pool contention spikes.
    valid_points = int(jax.device_get(batches[0]["mask"]).sum())
    chains = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = trainer.train_step(state, batches[i % 2], rng)
        float(m["loss"])
        chains.append((time.perf_counter() - t0) / ITERS)
    chains.sort()
    dt = chains[len(chains) // 2]

    pps = valid_points / dt

    # MFU: compiled-step FLOPs (XLA cost analysis) / wall clock / chip peak.
    # TPU v5e peak: 197 TFLOP/s bf16.  Judges "fast" against the hardware,
    # not only the estimated V100 baseline (point-cloud convs are gather/
    # selection-heavy, so single-digit MFU is expected — the metric tracks
    # how much of the step XLA spends on real matmul work).
    PEAK_FLOPS = 197e12
    # Trainer.step_flops counts the TIMED program: the accumulation step is
    # exactly batch x (per-block fwd+bwd) + one Adam update, and XLA's cost
    # analysis counts a lax.scan body once, so the body is counted directly
    # and scaled by the batch (train/loop.py:step_flops).
    import sys
    try:
        flops = trainer.step_flops(state, batches[0], rng)
    except Exception as e:
        print(f"WARNING: cost analysis unavailable ({e!r}); "
              "reporting mfu=0 — do NOT read this as a perf regression",
              file=sys.stderr)
        flops = 0.0
    mfu = flops / dt / PEAK_FLOPS if flops else 0.0

    # ---- inference benchmark: block sweep -> probs -> dense interpolation
    # (the reference times this ad hoc, interpolate.py:121-168).  Runs the
    # production eval pipeline (eval_scene_probs + interpolate_to_dense) on
    # one synthetic scene; reported as extra fields on the SAME json line
    # (the driver parses one object).
    eval_pps = 0.0
    try:
        from pointcloudsegmentation_tpu.eval import (eval_scene_probs,
                                                     interpolate_to_dense)

        apply_fn = jax.jit(lambda params, xyz, feats, mask:
                           trainer.model.apply(params, xyz, feats, mask,
                                               False))
        rng_np = np.random.RandomState(0)
        blocks = []
        for i in range(8):
            blk = toy.synthetic_room_block(rng_np, n=NUM_POINTS,
                                           num_classes=13, feat_dim=12)
            blocks.append({"xyz": jax.device_put(jnp_asarray(blk["xyz"])),
                           "feats": jax.device_put(
                               jnp_asarray(blk["feats"])),
                           "mask": jax.device_put(jnp_asarray(
                               np.ones(NUM_POINTS, bool))),
                           "block_min": np.array([3.0 * i, 0, 0],
                                                 np.float32)})
        # dense cloud: 4x the sampled density, drawn NEAR the sampled
        # surfaces (jittered copies) — queries far outside the support
        # force the native k-NN into expanding-ring retries and would bench
        # the degenerate case, not the S3DIS-shaped one
        dense = np.concatenate(
            [np.repeat(np.asarray(b["xyz"]), 4, axis=0)
             + rng_np.uniform(-0.05, 0.05, (4 * NUM_POINTS, 3)
                              ).astype(np.float32)
             + b["block_min"][None, :]
             for b in blocks], axis=0).astype(np.float32)
        eval_scene_probs(apply_fn, state.params, blocks)  # warm compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sxyz, probs = eval_scene_probs(apply_fn, state.params, blocks)
            _ = interpolate_to_dense(sxyz, probs, dense, k=6)
            times.append(time.perf_counter() - t0)
        times.sort()
        eval_pps = len(dense) / times[len(times) // 2]
    except Exception as e:
        import sys
        print(f"WARNING: eval benchmark failed ({e!r}); "
              "eval_points_per_sec=0", file=sys.stderr)

    print(json.dumps({
        "metric": "s3dis_train_points_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "flops_per_step": flops,
        "eval_points_per_sec_per_chip": round(eval_pps, 1),
    }))


if __name__ == "__main__":
    main()

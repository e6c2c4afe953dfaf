"""Sequential A/B bench arms in ONE process (device acquisition through the
remote-TPU tunnel costs minutes, so arms share a process; see bench.py for
the timing methodology — chained steps, one readback, median of 3 chains).

Usage:  python scripts/ab_arms.py '[{"label": "base"},
                                    {"label": "remat", "env": {"PCS_REMAT": "1"}},
                                    {"label": "b8", "batch": 8}]'
Each arm: {label, env?: {K: V}, batch?: int, points?: int, chunk?: int,
model?: str (registry key), config?: "s3dis"|"scannet"|"semantic3d"}.
Omitting points uses the config preset's num_points (e.g. semantic3d's
10240); model defaults to the preset's flagship.  Prints one JSON line
per arm.

Comparability note: default arms (config "s3dis", no overrides) run the
SAME workload as every recorded round (num_points=8192, caps=(4096,1024),
feat_dim=12 — the s3dis preset IS the historical fixed bench shape), so
default-arm numbers remain comparable to results/tpu_queue_r3/*.jsonl.
Arms that set config/model/points change the workload; compare those only
against arms carrying the same fields (each output line records
model/points/batch for exactly this).
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pointcloudsegmentation_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()


def run_arm(arm):
    from pointcloudsegmentation_tpu.data import toy
    from pointcloudsegmentation_tpu.train import (Trainer, s3dis_config,
                                                  scannet_config,
                                                  semantic3d_config)

    presets = {"s3dis": s3dis_config, "scannet": scannet_config,
               "semantic3d": semantic3d_config}
    env = arm.get("env", {})
    batch = int(arm.get("batch", 4))
    chunk = int(arm.get("chunk", 2048))
    iters = int(arm.get("iters", 20))

    saved = {k: os.environ.get(k) for k in env}
    os.environ.update({k: str(v) for k, v in env.items()})
    try:
        overrides = {}
        if "points" in arm:
            overrides["data_num_points"] = int(arm["points"])
        if "model" in arm:
            overrides["model"] = arm["model"]
        cfg = presets[arm.get("config", "s3dis")](**overrides)
        num_points = cfg.data.num_points
        trainer = Trainer(cfg, search_chunk=chunk)
        rng = jax.random.PRNGKey(0)
        batches = list(toy.toy_batches(
            2, batch_size=batch, num_points=num_points, kind="room",
            num_classes=cfg.data.num_classes, feat_dim=cfg.data.feat_dim))
        state = trainer.init_state(rng, batches[0])
        batches = jax.device_put(batches)
        for i in range(3):
            state, m = trainer.train_step(state, batches[i % 2], rng)
        float(m["loss"])
        valid = int(jax.device_get(batches[0]["mask"]).sum())
        chains = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = trainer.train_step(state, batches[i % 2], rng)
            float(m["loss"])
            chains.append((time.perf_counter() - t0) / iters)
        chains.sort()
        dt = chains[len(chains) // 2]
        return {"label": arm["label"], "points_per_sec": round(valid / dt, 1),
                "step_ms": round(dt * 1e3, 2), "batch": batch,
                "model": cfg.model, "points": num_points,
                "chains_ms": [round(c * 1e3, 2) for c in chains]}
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    arms = json.loads(sys.argv[1])
    for arm in arms:
        try:
            res = run_arm(arm)
        except Exception as e:  # keep later arms alive past a flaky arm
            res = {"label": arm.get("label"), "error": repr(e)[:300]}
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

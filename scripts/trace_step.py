"""Capture a device trace of the flagship train step and print the top-K
self-time ops (via tensorboard_plugin_profile's xplane converter) — the
Chrome-timeline analog of the reference's RunOptions.FULL_TRACE
(model_pooling.py:607-619).

Usage: python scripts/trace_step.py [--logdir /tmp/pcs_trace] [--top 40]
"""
import argparse
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from pointcloudsegmentation_tpu.data import toy  # noqa: E402
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config  # noqa: E402


def capture(logdir: str, num_points=8192, batch=4):
    cfg = s3dis_config(data_num_points=num_points,
                       data_caps=(num_points // 2, num_points // 8),
                       data_feat_dim=12)
    tr = Trainer(cfg, search_chunk=2048)
    rng = jax.random.PRNGKey(0)
    b = jax.device_put(next(toy.toy_batches(
        1, batch_size=batch, num_points=num_points, kind="room")))
    state = tr.init_state(rng, b)
    for _ in range(3):
        state, m = tr.train_step(state, b, rng)
    float(m["loss"])
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        state, m = tr.train_step(state, b, rng)
    float(m["loss"])
    jax.profiler.stop_trace()


def analyze(logdir: str, top: int):
    """Aggregate device-op self time from the raw xplane proto (the
    tensorboard_plugin_profile converter's TF binding is broken in this
    image, so read the XSpace directly; needs
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert xs, f"no xplane under {logdir}"
    x = max(xs, key=lambda p: Path(p).stat().st_mtime)
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(Path(x).read_bytes())
    for plane in sp.planes:
        if "TPU" not in plane.name and "device" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = {}
            for e in line.events:
                name = meta[e.metadata_id].name if e.metadata_id in meta \
                    else str(e.metadata_id)
                agg[name] = agg.get(name, 0) + e.duration_ps
            total = sum(agg.values())
            print(f"[{plane.name}] XLA op self-time: {total / 1e9:.1f} ms "
                  f"over {len(line.events)} events (3 steps)")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                print(f" {dur / 1e9:9.2f} ms  {100 * dur / total:5.1f}%  "
                      f"{name[:120]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", default="/tmp/pcs_trace_step")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--analyze-only", action="store_true")
    args = p.parse_args()
    if not args.analyze_only:
        capture(args.logdir)
    analyze(args.logdir, args.top)


if __name__ == "__main__":
    main()

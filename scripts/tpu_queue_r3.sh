#!/bin/bash
# Round-3 post-frame-fix TPU validation queue.  Runs strictly SEQUENTIALLY
# (single CPU core: concurrent compiles thrash — see memory/cost model);
# each stage logs to results/tpu_queue_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=results/tpu_queue_r3
mkdir -p "$OUT"

echo "=== stage 1: bench + A/B arms (one process, shared device) ==="
# base re-baselines after the lattice-frame fix (sort order changed);
# ck24/ovp256 probe whether the fixed frame's better Morton locality
# lets selection shrink further (gate any default change on stage 2)
timeout 3600 python scripts/ab_arms.py '[
  {"label": "base"},
  {"label": "remat", "env": {"PCS_REMAT": "1"}},
  {"label": "ck24", "env": {"PCS_CAND_K": "24"}},
  {"label": "ovp256", "env": {"PCS_OV_POOL": "256"}}
]' | tee "$OUT/ab_arms.jsonl"

echo "=== stage 2: on-hardware recall contract + grid (post-frame-fix) ==="
timeout 3600 python scripts/verify_search_recall.py --grid 2>&1 | tee "$OUT/recall.txt"

echo "=== stage 3: windowed-vs-exact parity A/B (fixed frame) ==="
timeout 5400 python scripts/parity_ab.py --epochs 12 --train-rooms 10 \
  --test-rooms 4 2>&1 | tee "$OUT/parity.txt"

echo "=== stage 4: headline bench.py (driver-identical invocation) ==="
timeout 2400 python bench.py | tee "$OUT/bench.json"

echo QUEUE DONE

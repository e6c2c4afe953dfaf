#!/bin/bash
# Round-3 post-frame-fix TPU validation queue.  Runs strictly SEQUENTIALLY
# (single CPU core: concurrent compiles thrash — see memory/cost model);
# each stage logs to results/tpu_queue_r3/.
set -u
cd "$(dirname "$0")/.."
OUT=results/tpu_queue_r3
mkdir -p "$OUT"

echo "=== stage 1: bench + remat A/B (one process, shared device) ==="
timeout 2400 python scripts/ab_arms.py '[
  {"label": "base"},
  {"label": "remat", "env": {"PCS_REMAT": "1"}}
]' | tee "$OUT/ab_bench_remat.jsonl"

echo "=== stage 2: on-hardware recall contract (post-frame-fix) ==="
timeout 1800 python scripts/verify_search_recall.py 2>&1 | tee "$OUT/recall.txt"

echo "=== stage 3: windowed-vs-exact parity A/B (fixed frame) ==="
timeout 5400 python scripts/parity_ab.py --epochs 12 --train-rooms 10 \
  --test-rooms 4 2>&1 | tee "$OUT/parity.txt"

echo "=== stage 4: headline bench.py (driver-identical invocation) ==="
timeout 2400 python bench.py | tee "$OUT/bench.json"

echo QUEUE DONE

#!/bin/bash
# Round-3 consolidated TPU experiment run (the TPU is exclusive-access
# through a flaky tunnel — ONE long script, per CLAUDE.md trap #1).
# Usage: bash tools/experiments/r3_run_all.sh >> /tmp/r3_run.log 2>&1
set -x
cd "$(dirname "$0")"

echo "=== leftover process check (kill by PID manually if any) ==="
pgrep -af "serving.server" || true

echo "=== phase 1: on-chip accuracy oracle (vit_t16 memorize) ==="
timeout 2400 python r3_oracle.py

echo "=== phase 2: ViT-L/16@384 maps-on memory ladder ==="
timeout 3000 python r3_vitl_maps.py

echo "=== phase 3: attention dot probes + headline refresh ==="
timeout 2400 python r3_attn_probe.py

echo "=== phase 4: default bench ==="
cd /root/repo
timeout 1800 python bench.py

echo "=== phase 5: serving bench (compute-p50 gate + dynamic variants) ==="
timeout 1800 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps viewer
timeout 1800 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps features --distinct-dynamic

cd "$(dirname "$0")"
echo "=== phase 6: AOT export artifacts on-chip ==="
timeout 2400 python r3_export_tpu.py

echo "=== phase 7: training throughput ==="
timeout 2400 python r3_train_bench.py

echo "=== r3 experiment run complete ==="

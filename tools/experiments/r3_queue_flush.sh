#!/bin/bash
# Round-3 sixth-session on-chip queue flush (ONE script — the TPU is
# exclusive-access through a flaky tunnel, CLAUDE.md trap #1). Order is
# the ROADMAP queue: export, saliency, ToMe, MoE oracle, soak, headline
# refresh, serving re-baseline on the (currently healthy) tunnel.
# Usage: bash tools/experiments/r3_queue_flush.sh >> /tmp/r3_queue.log 2>&1
set -x
cd "$(dirname "$0")"

echo "=== leftover process check ==="
pgrep -af "serving.server" || true

echo "=== phase 1: AOT export artifacts on-chip ==="
timeout 2400 python r3_export_tpu.py

echo "=== phase 2: saliency/gradient replays on-chip ==="
timeout 2400 python r3_saliency_tpu.py

echo "=== phase 3: ToMe token merging on-chip ==="
timeout 2400 python r3_tome_tpu.py

echo "=== phase 4: MoE accuracy oracle on-chip ==="
timeout 3000 python r3_moe_oracle.py

echo "=== phase 5: serving soak (multi-model mixed clients) ==="
timeout 1800 python r3_soak.py

echo "=== phase 6: headline bench refresh ==="
cd /root/repo
timeout 1800 python bench.py

echo "=== phase 7: serving re-baseline (good-tunnel phase) ==="
timeout 900 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps viewer
timeout 900 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps features --distinct-dynamic

echo "=== r3 queue flush complete ==="

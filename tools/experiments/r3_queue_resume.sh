#!/bin/bash
# Round-3 sixth-session queue RESUME: the first flush died mid-phase-3
# (ToMe sweep; phases 1-2 completed — see /tmp/r3_queue.log). One
# script, serialized (TPU is exclusive-access, CLAUDE.md trap #1).
# Usage: bash tools/experiments/r3_queue_resume.sh >> /tmp/r3_queue.log 2>&1
set -x
cd "$(dirname "$0")"

echo "=== resume phase 3: ToMe token merging on-chip ==="
timeout 2400 python r3_tome_tpu.py

echo "=== phase 4: MoE accuracy oracle on-chip ==="
timeout 3000 python r3_moe_oracle.py

echo "=== phase 4b: Swin family on-chip bench ==="
timeout 2400 python r3_swin_tpu.py

echo "=== phase 5: serving soak (multi-model mixed clients) ==="
timeout 1800 python r3_soak.py

echo "=== phase 6: headline bench refresh ==="
cd /root/repo
timeout 1800 python bench.py

echo "=== phase 7: serving re-baseline ==="
timeout 900 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps viewer
timeout 900 python bench_serving.py --model vit_t16 --clients 8 \
  --duration 30 --taps features --distinct-dynamic

echo "=== r3 queue resume complete ==="

#!/bin/bash
# Round-5 on-chip queue: every TPU artifact run back-to-back in ONE
# script (CLAUDE.md trap #1: one process owns the exclusive tunnel chip;
# trap #8: no concurrent host CPU load while TPU measurements run).
#
#   nohup bash tools/experiments/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
#
# Order: correctness gates first (they also pre-populate the persistent
# jit cache), then the serving artifact, then the perf matrix + headline
# (quiet host), then the batcher sweep (longest, least perf-critical).
set -x
cd /root/repo
export ROUND=5

echo "=== r5 queue start $(date) ==="

run() {
  name="$1"; shift
  echo "=== $name start $(date) ==="
  "$@" > "/tmp/r5_${name}.log" 2>&1
  code=$?
  echo "=== $name exit=$code $(date) ==="
  tail -5 "/tmp/r5_${name}.log"
}

run kernel_gate  python tools/experiments/kernel_gate.py --round 5
run serving      python tools/serving_bench_round.py
run bench_matrix python tools/bench_matrix.py
run bench        python bench.py
run batcher      python tools/experiments/r5_batcher_sweep.py

echo "=== r5 queue done $(date) ==="

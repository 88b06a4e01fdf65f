#!/bin/bash
# Round-3 sixth-session follow-up: rerun the ToMe throughput ladder
# AFTER the one-hot-einsum merge rewrite (the first queue's numbers are
# the scatter-based "before": r8 maps-off 1967-2225 vs dense 3792-4124),
# and rerun the swin sweep with honest device_get timing (the first run
# hit CLAUDE.md trap #9: block_until_ready returned early, 175k "imgs/s").
# Usage: bash tools/experiments/r3_queue_followup.sh >> /tmp/r3_queue.log 2>&1
set -x
cd "$(dirname "$0")"

echo "=== followup A: ToMe ladder post-einsum-merge ==="
timeout 2400 python r3_tome_tpu.py

echo "=== followup B: swin sweep, honest timing ==="
timeout 2400 python r3_swin_tpu.py

echo "=== followup C: soak with CURRENT-RSS tracking ==="
# the first soak tracked ru_maxrss only (monotone peak, 3.2 GB "growth"
# is not leak evidence); this one records VmRSS so a plateau is visible
timeout 1800 python r3_soak.py

echo "=== r3 queue followup complete ==="

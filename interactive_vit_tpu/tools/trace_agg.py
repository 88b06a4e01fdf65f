"""Aggregate jax.profiler traces by HLO category — the perf ground truth.

Wall-clock microbenchmarks LIE on this backend (``block_until_ready`` can
return before the device executes — CLAUDE.md trap #7); only profiler
device events are trustworthy for sub-ms kernels. This tool parses the
gzipped Chrome-trace JSON that ``jax.profiler.start_trace`` writes and sums
device-event durations by ``args.hlo_category`` ("custom-call" = Pallas
kernels) and by op name, so kernel budgets can be compared run-to-run.

Usage:
    python -m interactive_vit_tpu.tools.trace_agg /tmp/trace_dir [--top 20]

The reference has no profiling subsystem (console DEBUG prints only,
SURVEY.md §5); this replaces it with XLA's own device timeline.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
from typing import Dict, List, Tuple


def find_trace_files(log_dir: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                  recursive=True)
        + glob.glob(os.path.join(log_dir, "**", "*.trace.json"),
                    recursive=True)
    )


def load_events(path: str) -> List[dict]:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def aggregate(
    log_dir: str,
) -> Tuple[Dict[str, float], Dict[str, float], Dict[str, int]]:
    """Sum device-event durations (us) by hlo_category and by event name.

    Only complete events (ph == "X") carrying an ``args.hlo_category`` are
    device HLO executions; everything else (host runtime, flow arrows,
    counters) is skipped. Returns (by_category_us, by_name_us, counts).
    """
    by_cat: Dict[str, float] = collections.defaultdict(float)
    by_name: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.defaultdict(int)
    for path in find_trace_files(log_dir):
        for ev in load_events(path):
            if ev.get("ph") != "X":
                continue
            args = ev.get("args") or {}
            cat = args.get("hlo_category")
            if not cat:
                continue
            dur = float(ev.get("dur", 0.0))
            by_cat[cat] += dur
            by_name[ev.get("name", "?")] += dur
            counts[ev.get("name", "?")] += 1
    return dict(by_cat), dict(by_name), dict(counts)


def report(log_dir: str, top: int = 20) -> dict:
    by_cat, by_name, counts = aggregate(log_dir)
    total = sum(by_cat.values())
    out = {
        "total_device_us": round(total, 1),
        "by_category_us": {
            k: round(v, 1)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "top_ops_us": [
            {"name": k, "us": round(v, 1), "count": counts[k]}
            for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
        ],
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dir")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()
    print(json.dumps(report(args.log_dir, args.top), indent=2))


if __name__ == "__main__":
    main()

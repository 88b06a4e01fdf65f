"""Trace aggregation (tools/trace_agg.py): parse + sum device events."""

import gzip
import json
import os

from interactive_vit_tpu.tools.trace_agg import aggregate, report


def _write_trace(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_aggregate_by_category(tmp_path):
    events = [
        # device HLO events (kept)
        {"ph": "X", "name": "fusion.1", "dur": 100.0,
         "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "name": "fusion.1", "dur": 50.0,
         "args": {"hlo_category": "convolution fusion"}},
        {"ph": "X", "name": "custom-call.2", "dur": 30.0,
         "args": {"hlo_category": "custom-call"}},
        # non-HLO noise (skipped): host event, flow arrow, counter
        {"ph": "X", "name": "ExecuteOnStream", "dur": 999.0},
        {"ph": "s", "name": "flow", "id": 1},
        {"ph": "C", "name": "mem", "args": {"bytes": 5}},
    ]
    d = str(tmp_path / "plugins" / "profile" / "run1")
    _write_trace(os.path.join(d, "host.trace.json.gz"), events)
    by_cat, by_name, counts = aggregate(str(tmp_path))
    assert by_cat == {"convolution fusion": 150.0, "custom-call": 30.0}
    assert counts["fusion.1"] == 2
    r = report(str(tmp_path), top=5)
    assert r["total_device_us"] == 180.0
    assert r["top_ops_us"][0]["name"] == "fusion.1"


def test_aggregate_latest_run_only(tmp_path):
    """Re-running a sweep into the same trace dir leaves the previous
    timestamped profile subdir behind; default aggregation must not sum
    stale runs (that silently doubles every device total)."""
    ev = lambda dur: [{"ph": "X", "name": "f", "dur": dur,  # noqa: E731
                       "args": {"hlo_category": "fusion"}}]
    old = os.path.join(str(tmp_path), "plugins", "profile", "r1",
                       "t.trace.json.gz")
    new = os.path.join(str(tmp_path), "plugins", "profile", "r2",
                       "t.trace.json.gz")
    _write_trace(old, ev(100.0))
    _write_trace(new, ev(30.0))
    os.utime(old, (1.0, 1.0))  # mtime order decides, not dir names
    by_cat, _, _ = aggregate(str(tmp_path))
    assert by_cat == {"fusion": 30.0}
    by_cat_all, _, _ = aggregate(str(tmp_path), latest_only=False)
    assert by_cat_all == {"fusion": 130.0}


def test_gz_shadows_uncompressed_twin(tmp_path):
    d = str(tmp_path / "plugins" / "profile" / "run1")
    events = [{"ph": "X", "name": "f", "dur": 10.0,
               "args": {"hlo_category": "fusion"}}]
    _write_trace(os.path.join(d, "t.trace.json.gz"), events)
    with open(os.path.join(d, "t.trace.json"), "w") as f:
        json.dump({"traceEvents": events}, f)
    by_cat, _, counts = aggregate(str(tmp_path))
    assert by_cat == {"fusion": 10.0}
    assert counts["f"] == 1

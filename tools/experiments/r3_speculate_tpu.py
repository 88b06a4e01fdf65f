"""Round-3: speculative tap precompilation measured on the real chip.

The interactive cost this feature removes: each re-target of an attention
viewer onto a different block is a new (topology, tap-set) program — a
cold compile through the tunneled compile helper (5-8 s class). The
speculator (serving/speculate.py) precompiles sibling re-targets in the
background after the first tap.

Two in-process serving runs over vit_b16 bf16, each with its OWN fresh
compilation-cache dir (so no run warms the other and re-runs stay
honest):

1. control: speculation off — scrub blocks 0..11, every request cold;
2. speculative browsing pace: dwell between scrubs (a user looks at each
   map) — the warmer should stay ahead, every scrub warm;
3. speculative fast scrub: no dwell — the quiet-period gate must pause
   the warmer so scrub latency tracks the control (first measured run
   WITHOUT the gate: real cold compiles queued behind in-flight
   speculative ones, 6.7s -> 24s compounding).

Emits JSONL to /tmp/r3_speculate.jsonl.
"""

import tempfile
import time

import numpy as np

from _harness import make_emit

emit = make_emit("/tmp/r3_speculate.jsonl")

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import Request  # noqa: E402

import os

# vit_b16 is the flagship measurement; IVT_SPEC_MODEL=vit_t16 swaps in
# the tiny model for gate-behavior validation when the tunnel is in a
# minutes-per-compile phase (the warmer/gate logic is model-independent)
MODEL = os.environ.get("IVT_SPEC_MODEL", "vit_b16")
NAMES = ([f"{MODEL}:transform", f"{MODEL}:embed"]
         + [f"{MODEL}:blocks.{i}" for i in range(12)]
         + [f"{MODEL}:norm", f"{MODEL}:head"])
RNG = np.random.default_rng(0)
IMG = RNG.random((3, 224, 224), dtype=np.float32)


def make_graph(block: int) -> Graph:
    g = Graph()
    prev, nodes = None, {}
    for ln in NAMES:
        n = g.add_node(ln)
        nodes[ln] = n
        if prev is not None:
            g.connect(prev, "o", n, "o")
        prev = n
    viewer = g.add_node("attn_view")
    g.connect(nodes[f"{MODEL}:blocks.{block}"], "attn", viewer, "attn")
    g.add_input(IMG, g.nodes[0], "o")
    return g


def run(tag: str, speculate: bool, dwell_s: float):
    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
    app = build_app(models=[MODEL], dtype_name="bfloat16",
                    speculate=speculate)
    app.batcher.start()
    if app.speculator is not None:
        app.speculator.start()
    try:
        t0 = time.perf_counter()
        app.compute(Request.encode(make_graph(0)))
        emit(stage=tag, block=0, s=round(time.perf_counter() - t0, 2),
             phase="first")
        for blk in range(1, 12):
            time.sleep(dwell_s)
            t0 = time.perf_counter()
            app.compute(Request.encode(make_graph(blk)))
            emit(stage=tag, block=blk,
                 s=round(time.perf_counter() - t0, 2), phase="scrub")
        lat2 = []
        for blk in range(12):
            t0 = time.perf_counter()
            app.compute(Request.encode(make_graph(blk)))
            lat2.append(time.perf_counter() - t0)
        emit(stage=tag, phase="second_pass",
             p50_s=round(float(np.median(lat2)), 3),
             max_s=round(float(np.max(lat2)), 3),
             warmed=(app.speculator.compiled
                     if app.speculator is not None else None))
    finally:
        if app.speculator is not None:
            app.speculator.stop()
        app.batcher.stop()


RUNS = {
    "control": ("control_no_speculation", False, 0.0),
    "browsing": ("speculative_browsing", True, 8.0),
    "fast": ("speculative_fast_scrub", True, 0.0),
}

if __name__ == "__main__":
    import sys

    picked = sys.argv[1:] or list(RUNS)
    for name in picked:
        tag, spec, dwell = RUNS[name]
        run(tag, speculate=spec, dwell_s=dwell)
    emit(stage="done")

"""Round-3: gradient taps (saliency / Grad-CAM / dream) on the real chip.

What this measures (single process, one model load — CLAUDE.md trap #1):

1. Forward-only vit_b16 step (logits tap) — the baseline.
2. saliency (mode=grad, wrt the image): forward+backward+render fused in
   one program — the marginal cost of a gradient tap vs the forward.
3. saliency class-scrub latency: class is a dynamic capture, so scrubs
   must be cache hits (the interactive contract).
4. Grad-CAM (wrt=node:<block>): dependence-filtered replay — cost should
   track the replayed depth, not the full model.
5. dream (32 ascent steps as an in-program lax.scan): whole optimization
   loop on-device; wall per step reported.
6. SmoothGrad (8 samples): scan of noisy backward passes.

Emits JSONL to /tmp/r3_saliency.jsonl.
"""

import time

import numpy as np

from _harness import make_emit

emit = make_emit("/tmp/r3_saliency.jsonl")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache_sal")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.vit_plugin import make_vit_model  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402

MODEL = "vit_b16"
BATCH = 8  # interactive-session scale, not the throughput knee

reg = Registry()
register_builtin(reg)
make_vit_model(MODEL).register(reg)
ex = Executor(reg)

NAMES = ([f"{MODEL}:embed"] + [f"{MODEL}:blocks.{i}" for i in range(12)]
         + [f"{MODEL}:norm", f"{MODEL}:head"])


def build(extra=None, extra_params=None, wire_from="head"):
    g = Graph()
    nodes = [g.add_node(n) for n in NAMES]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    img = np.random.default_rng(0).random(
        (BATCH, 3, 224, 224)).astype(np.float32)
    g.add_input(img, nodes[0], "o")
    tap = (len(NAMES) - 1, "o")
    if extra is not None:
        e = g.add_node(extra, extra_params or {})
        g.connect(nodes[-1], "o", e, "o")
        tap = (e.index, "o")
    return g, tap


def timed(g, taps, label, iters=10):
    t0 = time.perf_counter()
    ex.run(g, taps=taps, to_host=False)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ex.run(g, taps=taps, to_host=False)
    jax.block_until_ready(out)
    step_ms = (time.perf_counter() - t0) / iters * 1e3
    emit(stage=label, compile_s=round(compile_s, 2),
         step_ms=round(step_ms, 2), batch=BATCH,
         cache_hit=ex.last_stats.cache_hit)
    return step_ms


# 1. forward baseline
g, tap = build()
fwd_ms = timed(g, {tap}, "forward_logits")

# 2. saliency wrt image
g, tap = build("saliency", {"target": "max", "mode": "grad"})
sal_ms = timed(g, {tap}, "saliency_grad")
emit(stage="saliency_vs_forward", ratio=round(sal_ms / fwd_ms, 2))

# 3. class scrub: dynamic capture — every scrub must be a cache hit
g, tap = build("saliency", {"target": "class", "class": "0"})
ex.run(g, taps={tap}, to_host=False)  # compile
scrubs = []
sal_node = g.nodes[tap[0]]
for cls in (7, 123, 400, 900):
    sal_node.params["class"] = str(cls)
    t0 = time.perf_counter()
    out = ex.run(g, taps={tap}, to_host=False)
    jax.block_until_ready(out)
    scrubs.append((time.perf_counter() - t0) * 1e3)
    assert ex.last_stats.cache_hit, "class scrub recompiled!"
emit(stage="class_scrub", scrub_ms=[round(s, 2) for s in scrubs])

# 4. Grad-CAM at two depths: replay cost should track the replayed depth
for blk in (2, 10):
    g, tap = build("saliency",
                   {"target": "max", "mode": "gradxinput",
                    "wrt": f"node:{1 + blk}"})
    timed(g, {tap}, f"gradcam_block{blk}")

# 5. dream: 32 ascent steps in one lax.scan program
g, tap = build("dream", {"target": "class", "class": "0",
                         "steps": "32", "lr": "0.05"})
dream_ms = timed(g, {tap}, "dream_32steps", iters=3)
emit(stage="dream_per_step", ms=round(dream_ms / 32, 2))

# 6. SmoothGrad, 8 samples
g, tap = build("saliency", {"target": "max", "mode": "smooth",
                            "steps": "8"})
timed(g, {tap}, "smoothgrad_8")

emit(stage="done")

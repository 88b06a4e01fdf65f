"""Round-3: AOT export artifacts on the real chip.

Validates the deployment story end-to-end on TPU (single process,
CLAUDE.md trap #1):

1. Export vit_t16 (primary taps, batch 8) ON the TPU backend; reload the
   artifact and check numeric parity vs the live executor.
2. Exported-artifact steady-state throughput vs the live executor's on
   the same batch (the artifact should be the same program: ~equal).
3. A dynamic-capture edit (saliency class scrub) through the ARTIFACT —
   no recompile, values change.
4. The cross-platform (cpu,tpu) artifact exported on the CPU backend by
   CI executes on the chip: tests/test_export.py lowers it, this runs it.

Emits JSONL to /tmp/r3_export.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_export.jsonl")

import jax  # noqa: E402

setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.export import (  # noqa: E402
    export_graph, load_artifact,
)
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.vit_plugin import make_vit_model  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.wire.schema import (  # noqa: E402
    generate_model_graph_json, graph_from_json,
)

import jax.numpy as jnp  # noqa: E402

BATCH = 8
reg = Registry()
register_builtin(reg)
model = make_vit_model("vit_t16", dtype=jnp.bfloat16)
model.register(reg)

obj = generate_model_graph_json(model.list_node_names())
rng = np.random.default_rng(0)
img = rng.random((BATCH, 3, 224, 224), dtype=np.float32)


def build_graph():
    g = graph_from_json(obj)
    for n in g.nodes:
        kind = reg.get_node(n.name)
        if getattr(kind, "optional_inputs", False):
            continue
        for ch in kind.io(n.params)["ins"]:
            if ch == "o" and ch not in n.inputs:
                g.add_input(img, n, ch)
    return g


# -- 1. export on TPU + parity ------------------------------------------------
g = build_graph()
ex = Executor(reg)
t0 = time.perf_counter()
want = ex.run(g, taps="primary")
live_cold_s = time.perf_counter() - t0

t0 = time.perf_counter()
export_graph(g, "/tmp/vit_t16_tpu_aot", taps="primary", executor=ex)
export_s = time.perf_counter() - t0
art = load_artifact("/tmp/vit_t16_tpu_aot")
t0 = time.perf_counter()
got = art(img)
art_cold_s = time.perf_counter() - t0

worst = 0.0
for i, chans in want.items():
    for ch, v in chans.items():
        a = np.asarray(v, np.float32)
        b = np.asarray(got[i][ch], np.float32)
        worst = max(worst, float(np.max(np.abs(a - b))))
emit(stage="parity", max_abs_err=worst, export_s=round(export_s, 2),
     live_cold_s=round(live_cold_s, 2), art_cold_s=round(art_cold_s, 2))

# -- 2. steady-state throughput, artifact vs live -----------------------------
ITERS = 20
for _ in range(2):
    art(img)
t0 = time.perf_counter()
for _ in range(ITERS):
    out = art(img)
art_wall = (time.perf_counter() - t0) / ITERS
for _ in range(2):
    ex.run(g, taps="primary")
t0 = time.perf_counter()
for _ in range(ITERS):
    ex.run(g, taps="primary")
live_wall = (time.perf_counter() - t0) / ITERS
emit(stage="throughput", batch=BATCH,
     artifact_ms=round(art_wall * 1e3, 2),
     live_ms=round(live_wall * 1e3, 2),
     artifact_imgs_s=round(BATCH / art_wall, 1),
     live_imgs_s=round(BATCH / live_wall, 1))

# -- 3. dynamic-capture scrub through the artifact -----------------------------
# saliency off the head: wire image + saliency target
sal = None
try:
    from interactive_vit_tpu.graph.ir import Graph

    g2 = Graph()
    emb = g2.add_node("vit_t16:embed")
    prev = emb
    for i in range(12):
        b = g2.add_node(f"vit_t16:blocks.{i}")
        g2.connect(prev, "o", b, "o")
        prev = b
    head = g2.add_node("vit_t16:head")
    g2.connect(prev, "o", head, "o")
    sal = g2.add_node("saliency", {"target": "class", "class": "0"})
    g2.connect(head, "o", sal, "o")
    g2.add_input(img[:1], emb, "o")
    export_graph(g2, "/tmp/vit_t16_sal_aot",
                 taps={(sal.index, "g")}, executor=ex)
    art2 = load_artifact("/tmp/vit_t16_sal_aot")
    t0 = time.perf_counter()
    g0 = np.asarray(art2(img[:1])[sal.index]["g"])
    first_s = time.perf_counter() - t0
    scrubs = []
    for c in (3, 7, 11):
        art2.set_cap(sal.index, "class", c)
        t0 = time.perf_counter()
        gc = np.asarray(art2(img[:1])[sal.index]["g"])
        scrubs.append(time.perf_counter() - t0)
        assert not np.allclose(gc, g0), "scrub did not change the gradient"
    emit(stage="scrub", first_s=round(first_s, 2),
         scrub_ms=[round(s * 1e3, 1) for s in scrubs])
except Exception as err:  # noqa: BLE001 — keep later stages running
    emit(stage="scrub", error=str(err)[:500])

# -- 4. run the CI-exported cross-platform artifact, if present ----------------
import os  # noqa: E402

if os.path.isdir("/tmp/xplat_art"):
    try:
        artx = load_artifact("/tmp/xplat_art")
        x = rng.random((1, 3, 32, 32), dtype=np.float32)
        out = artx(x)
        emit(stage="cross_platform",
             ran_on=str(jax.devices()[0].platform),
             out_shapes={f"{i}/{c}": list(np.asarray(v).shape)
                         for i, ch in out.items() for c, v in ch.items()})
    except Exception as err:  # noqa: BLE001
        emit(stage="cross_platform", error=str(err)[:500])
else:
    emit(stage="cross_platform", skipped="no /tmp/xplat_art")

emit(stage="done")

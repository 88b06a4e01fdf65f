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

# -- 4. CPU-exported cross-platform artifact executes on the chip --------------
# The claim under test: an artifact lowered for ("cpu","tpu") on a CPU
# backend runs on real TPU hardware. The CPU export happens in a
# SUBPROCESS that forces the cpu platform in-process (it never touches
# the exclusive TPU — CLAUDE.md trap #1/#3); this process then loads and
# runs the artifact on the chip.
import subprocess  # noqa: E402
import sys as _sys  # noqa: E402

XPLAT_EXPORT = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.export import export_graph
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.models.vit_plugin import make_vit_model
from interactive_vit_tpu.ops.node_ops import register_builtin

reg = Registry(); register_builtin(reg)
cfg = vit.ViTConfig("vit_xp", img_size=32, patch=16, width=64, depth=2,
                    heads=4, num_classes=8)
vit.VARIANTS["vit_xp"] = cfg
make_vit_model("vit_xp", kernels=False).register(reg)
g = Graph()
emb = g.add_node("vit_xp:embed"); head = g.add_node("vit_xp:head")
g.connect(emb, "o", head, "o")
img = np.random.default_rng(0).random((1, 3, 32, 32)).astype(np.float32)
g.add_input(img, emb, "o")
export_graph(g, "/tmp/xplat_art", taps="primary", executor=Executor(reg),
             platforms=["cpu", "tpu"])
# the CPU-side truth for the on-chip parity check
out = Executor(reg).run(g, taps="primary")
np.save("/tmp/xplat_want.npy", np.asarray(out[head.index]["o"]))
print("XPLAT_EXPORT_OK")
"""

try:
    r = subprocess.run([_sys.executable, "-c", XPLAT_EXPORT],
                       capture_output=True, text=True, timeout=600)
    if "XPLAT_EXPORT_OK" not in r.stdout:
        raise RuntimeError(f"cpu export subprocess failed: "
                           f"{(r.stderr or r.stdout)[-500:]}")
    artx = load_artifact("/tmp/xplat_art")
    x = np.random.default_rng(0).random((1, 3, 32, 32)).astype(np.float32)
    out = artx(x)
    want = np.load("/tmp/xplat_want.npy")
    head_i = max(out)
    err = float(np.max(np.abs(
        np.asarray(out[head_i]["o"], np.float32) - want)))
    emit(stage="cross_platform", ran_on=str(jax.devices()[0].platform),
         max_abs_err_vs_cpu=err)
except Exception as err:  # noqa: BLE001
    emit(stage="cross_platform", error=str(err)[:500])

emit(stage="done")

"""Round-3: CLIP zero-shot path on the real chip.

Compiles and times the full zero-shot program (image tower + text tower +
similarity, one staged executor program) at serving-realistic batches, in
bf16 with the fused kernels on, plus the text tower alone. Emits JSONL to
/tmp/r3_clip_zeroshot.jsonl.

Wall clocks are full-program steps with a forced device_get, which stay
roughly honest on this backend (CLAUDE.md trap #8).
"""

import json
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_clip_zeroshot.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.clip_plugin import make_clip_model  # noqa: E402
from interactive_vit_tpu.models.clip_text_plugin import (  # noqa: E402
    generate_zeroshot_graph_json,
    make_clip_text_model,
)
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.wire.schema import graph_from_json  # noqa: E402

reg = Registry()
register_builtin(reg)
t0 = time.time()
make_clip_model(dtype=jnp.bfloat16).register(reg)
make_clip_text_model(dtype=jnp.bfloat16).register(reg)
emit(stage="models", wall_s=round(time.time() - t0, 1))

gobj = generate_zeroshot_graph_json()
sim = next(i for i, nd in enumerate(gobj["nodes"])
           if nd["instance"].get("endpoint") == "similarity")
ex = Executor(reg)
rng = np.random.default_rng(0)

for batch in (1, 8, 32):
    g = graph_from_json(gobj)
    img = rng.random((batch, 3, 256, 256), dtype=np.float32)
    g.add_input(img, g.nodes[0], "o")
    taps = {(sim, "o")}
    t0 = time.time()
    out = ex.run(g, taps=taps)
    compile_s = time.time() - t0
    logits = np.asarray(out[sim]["o"], dtype=np.float32)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = ex.run(g, taps=taps)  # to_host=True forces completion
    dt = (time.time() - t0) / iters
    emit(stage="zeroshot", batch=batch, compile_s=round(compile_s, 1),
         step_ms=round(dt * 1e3, 2),
         imgs_per_s=round(batch / dt, 1),
         logits_shape=list(logits.shape),
         finite=bool(np.isfinite(logits).all()))

# text tower alone: the prompt-edit path (recompile per prompt-set edit —
# measure both the retrace cost and the cached re-eval)
tm = make_clip_text_model(dtype=jnp.bfloat16)
tobj = tm.generate_graph_json()
for n_prompts in (4, 16, 64):
    prompts = [f"a photo of thing number {i}" for i in range(n_prompts)]
    tg = graph_from_json(tobj)
    tg.nodes[0].params["prompts"] = json.dumps(prompts)
    last = len(tobj["nodes"]) - 1
    t0 = time.time()
    out = ex.run(tg, taps={(last, "o")})
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = ex.run(tg, taps={(last, "o")})
    dt = (time.time() - t0) / 5
    emb = np.asarray(out[last]["o"], dtype=np.float32)
    emit(stage="text_tower", n_prompts=n_prompts,
         compile_s=round(compile_s, 1), step_ms=round(dt * 1e3, 2),
         emb_shape=list(emb.shape),
         norm_err=float(np.abs(np.linalg.norm(emb, axis=-1) - 1).max()))

emit(stage="done")

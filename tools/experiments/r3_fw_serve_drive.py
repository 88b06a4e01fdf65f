"""Verify drive: swin_t saved graph through the Executor on the real chip
with the fused window kernel auto-dispatched (the serving path)."""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_fw_drive.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.wire.schema import graph_from_json  # noqa: E402
from interactive_vit_tpu.models.swin_plugin import make_swin_model  # noqa: E402
from interactive_vit_tpu.ops.dispatch import default_window_impl  # noqa: E402
from interactive_vit_tpu.models import swin  # noqa: E402

cfg = swin.VARIANTS["swin_t"]
impl = default_window_impl("auto", dtype=jnp.bfloat16, cfg=cfg)
emit(stage="dispatch", kernel_selected=impl is not None)

reg = Registry()
register_builtin(reg)
model = make_swin_model("swin_t", dtype=jnp.bfloat16)
model.register(reg)
with open("/root/repo/static/graphs/swin_t.json") as f:
    g = graph_from_json(json.load(f))
img = np.random.default_rng(0).random((1, 3, 224, 224), np.float32)
g.add_input(img, g.nodes[0], "o")
ex = Executor(reg)

blk = next(n.index for n in g.nodes if n.name == "swin_t:stages.2.1")
head = next(n.index for n in g.nodes if n.name == "swin_t:head")
outs = ex.run(g, taps={(blk, "attn"), (head, "o")})
a0 = np.asarray(outs[blk]["attn"], np.float32)
logits = np.asarray(outs[head]["o"], np.float32)
emit(stage="drive", attn_shape=list(a0.shape),
     logits_shape=list(logits.shape),
     softmax_mass=float(a0.reshape(-1, a0.shape[-1]).sum(-1).mean()),
     finite=bool(np.isfinite(logits).all()))
outs2 = ex.run(g, taps={(blk, "attn"), (head, "o")})
emit(stage="rerun", cache_hit=bool(ex.last_stats.cache_hit),
     same=bool(np.allclose(
         np.asarray(outs2[blk]["attn"], np.float32), a0)))

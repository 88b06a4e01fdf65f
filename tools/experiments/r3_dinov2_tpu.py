"""Round-3: DINOv2 on the real chip — LayerScale + register tokens at the
native 518px/37x37 geometry (N=1374 with reg4), XLA block path (fused
kernels are disabled for LayerScale configs by design).

Drives the executor end-to-end: dense features + one block's attention
tap over CLS+registers+patches. Emits /tmp/r3_dinov2.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_dinov2.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.models.vit_plugin import make_vit_model  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.wire.schema import graph_from_json  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

for name in ("dinov2_s14_reg",):
    try:
        cfg = vit.VARIANTS[name]
        reg = Registry()
        register_builtin(reg)
        model = make_vit_model(name, dtype=jnp.bfloat16,
                               with_categories=False)
        model.register(reg)
        g = graph_from_json(model.generate_graph_json())
        img = np.random.default_rng(0).random(
            (1, 3, 560, 560), np.float32)
        blk5 = norm = None
        for n in g.nodes:
            if not n.inputs and n.name.endswith(":transform"):
                g.add_input(jnp.asarray(img), n, "o")
            if n.name.endswith(":blocks.5"):
                blk5 = n
            if n.name.endswith(":norm"):
                norm = n
        ex = Executor(reg)
        taps = {(norm.index, "o"), (blk5.index, "attn")}
        t0 = time.perf_counter()
        outs = ex.run(g, taps=taps)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = ex.run(g, taps=taps)
        jax.block_until_ready(jax.tree.leaves(outs))
        warm = time.perf_counter() - t0
        att = np.asarray(outs[blk5.index]["attn"], np.float32)
        feats = np.asarray(outs[norm.index]["o"])
        emit(stage="serve", model=name, cold_s=round(cold, 2),
             warm_s=round(warm, 3),
             attn_shape=list(att.shape),
             softmax_mass_err=float(np.abs(att.sum(-1) - 1).max()),
             feats_shape=list(feats.shape),
             finite=bool(np.isfinite(feats).all()))
    except Exception as e:  # noqa: BLE001
        emit(stage="error", model=name, err=repr(e)[:600])

emit(stage="done")

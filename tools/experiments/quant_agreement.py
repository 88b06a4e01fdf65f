"""Quantization accuracy proxy (no real weights in this environment).

Measures, per dtype mode, the top-1 AGREEMENT with the bf16 path and the
logit perturbation relative to logit spread, using identical random
weights and a stream of random images. Not a substitute for real-weights
top-1, but it bounds the perturbation class: a mode that flips x% of
argmaxes on smooth random logits is at least that disruptive on real
ones. Writes /tmp/r3_quant_agreement.jsonl.
"""

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_quant_agreement.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops.dispatch import (  # noqa: E402
    default_block_impl, default_mlp_impl,
)
from interactive_vit_tpu.ops.quant import quantize_tree  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

VARIANT = "vit_b16"
cfg = vit.VARIANTS[VARIANT]
params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
block = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                           d=cfg.width, heads=cfg.heads)


def make_fn(p, mlp_impl=None, block_impl=block):
    def fn(images):
        return vit.forward(p, images, cfg, block_impl=block_impl,
                           mlp_impl=mlp_impl)["logits"]
    return jax.jit(fn)


modes = {"bf16": make_fn(params)}
# weight-only int8 stores {"q","scale"} leaves the fused block kernel
# can't take — it serves the unfused path (vit_plugin does the same)
modes["int8_w8"] = make_fn(quantize_tree(params, mode="w8"),
                           block_impl=None)
w8a8_params = quantize_tree(params, names=frozenset({"fc1_w", "fc2_w"}),
                            mode="w8a8")
modes["int8w8a8_mlp"] = make_fn(
    w8a8_params,
    mlp_impl=default_mlp_impl("auto", dtype=jnp.bfloat16, d=cfg.width,
                              mlp_dim=cfg.mlp_dim, quant="w8a8"))

BATCH, ROUNDS = 64, 8
agree = {k: 0 for k in modes if k != "bf16"}
mae = {k: 0.0 for k in agree}
spread = 0.0
for r in range(ROUNDS):
    imgs = jnp.asarray(
        np.random.default_rng(r).random((BATCH, 3, cfg.img_size,
                                         cfg.img_size), dtype=np.float32),
        jnp.bfloat16)
    ref = np.asarray(modes["bf16"](imgs), np.float32)
    spread += float(ref.std())
    top = ref.argmax(-1)
    for k in agree:
        lg = np.asarray(modes[k](imgs), np.float32)
        agree[k] += int((lg.argmax(-1) == top).sum())
        mae[k] += float(np.abs(lg - ref).mean())

n = BATCH * ROUNDS
for k in agree:
    emit(stage="agreement", variant=VARIANT, mode=k,
         top1_agreement=round(agree[k] / n, 4),
         logit_mae=round(mae[k] / ROUNDS, 5),
         logit_mae_over_spread=round(mae[k] / ROUNDS / (spread / ROUNDS), 4))
emit(stage="done")

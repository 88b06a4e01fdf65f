"""Round-3: quantization accuracy on a REAL trained checkpoint.

Round 2's quant "accuracy proxy" compared random-init models (VERDICT r2
weak #4: agreement between random models is nearly free). The on-chip
oracle run (r3_oracle.py) produced an actually-trained vit_t16; this
script measures, on its 256-image memorize set:

  - bf16 top-1 (the reference point),
  - weight-only int8 top-1 + agreement with bf16,
  - W8A8 (weights + activations, the opt-in --dtype int8w8a8 class)
    top-1 + agreement,
  - top-1 logit-margin stats, so "agreement" is interpretable.

Emits JSONL to /tmp/r3_quant.jsonl.
"""

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_quant.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops.quant import quantize_tree  # noqa: E402
from interactive_vit_tpu.tools.convert import convert  # noqa: E402
from interactive_vit_tpu.tools.train import pattern_set  # noqa: E402
from interactive_vit_tpu.utils.safetensors_io import load_file  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

CKPT = "/tmp/r3_oracle_ckpt/vit_t16_oracle.safetensors"
cfg = vit.VARIANTS["vit_t16"]
params_f32 = convert("vit_t16", "auto", load_file(CKPT))
images, labels = pattern_set(0, 256, cfg.img_size, cfg.num_classes, 64)


def top1(params, dtype, quant=None, batch=64):
    p = jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "astype")
        and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
        params)
    if quant:
        p = quantize_tree(p, mode=quant)

    @jax.jit
    def fn(p, x):
        return vit.forward(p, x, cfg)["logits"]

    preds, margins = [], []
    for lo in range(0, len(labels), batch):
        x = jnp.asarray(images[lo:lo + batch], dtype)
        logits = np.asarray(fn(p, x), np.float32)
        order = np.sort(logits, axis=-1)
        margins.append(order[:, -1] - order[:, -2])
        preds.append(logits.argmax(-1))
    preds = np.concatenate(preds)
    margins = np.concatenate(margins)
    return preds, margins


preds_bf16, margins = top1(params_f32, jnp.bfloat16)
emit(stage="bf16", top1=float((preds_bf16 == labels).mean()),
     margin_p50=float(np.median(margins)),
     margin_p10=float(np.percentile(margins, 10)))

for name, q in [("int8_weight_only", "w8"), ("w8a8", "w8a8")]:
    preds, _ = top1(params_f32, jnp.bfloat16, quant=q)
    emit(stage=name,
         top1=float((preds == labels).mean()),
         agreement_vs_bf16=float((preds == preds_bf16).mean()))

emit(stage="done")

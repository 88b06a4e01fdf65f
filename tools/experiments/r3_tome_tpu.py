"""Round-3: ToMe token merging on the real chip — speed AND fidelity.

One process (CLAUDE.md trap #1), two questions:

1. **Throughput**: vit_b16 dense (the shipping fused-kernel config, the
   control) vs vit_b16_tome r=8 / r=16 on the same batch ladder, maps
   off and on. ToMe runs the XLA attention path by design (merged N sits
   below the kernel crossover; proportional attention needs key_bias).
2. **Fidelity on a TRAINED model** (the r3_oracle checkpoint — trains it
   here if missing): top-1 on the memorize set and agreement vs the
   dense model at r ∈ {4, 8, 16} on vit_t16, plus logit-margin stats so
   agreement is interpretable. Random-init agreement is nearly free
   (VERDICT r2 weak #4); this is the real statement.

Emits JSONL to /tmp/r3_tome.jsonl.
"""

import os
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_tome.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import tome, vit  # noqa: E402
from interactive_vit_tpu.ops.dispatch import (  # noqa: E402
    default_attn_impl, default_block_impl,
)
from interactive_vit_tpu.ops.layouts import (  # noqa: E402
    row_major_out_shardings,
)

BATCHES = (32, 64, 96, 128)
ITERS = 10


def sweep(tag, fwd, params, img_size, want_attn, dtype=jnp.bfloat16):
    for batch in BATCHES:
        try:
            images = jnp.asarray(
                np.random.default_rng(0).random(
                    (batch, 3, img_size, img_size), dtype=np.float32),
                dtype=dtype)
            sh = row_major_out_shardings(fwd, params, images)
            jitted = (jax.jit(fwd, out_shardings=sh) if sh is not None
                      else jax.jit(fwd))
            jax.block_until_ready(jitted(params, images))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = jitted(params, images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            emit(stage="sweep", tag=tag, maps=want_attn, batch=batch,
                 ips=round(batch * ITERS / dt, 1),
                 ms_per_batch=round(dt / ITERS * 1e3, 2))
        except Exception as e:  # noqa: BLE001 — keep the ladder going
            emit(stage="error", tag=tag, maps=want_attn, batch=batch,
                 err=repr(e)[:500])


# -- 1. throughput: dense control vs tome r=8 / r=16 ---------------------------

bcfg = vit.VARIANTS["vit_b16"]
bparams = vit.init_params(jax.random.key(0), bcfg, dtype=jnp.bfloat16)
attn_impl = default_attn_impl("auto")
block_impl = default_block_impl("auto", dtype=jnp.bfloat16, n=bcfg.tokens,
                                d=bcfg.width, heads=bcfg.heads)

for want_attn in (False, True):
    def dense_fwd(p, x, want_attn=want_attn):
        out = vit.forward(p, x, bcfg, want_attn=want_attn,
                          attn_impl=attn_impl, block_impl=block_impl)
        if want_attn:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"]

    sweep("dense_kernels", dense_fwd, bparams, bcfg.img_size, want_attn)

    for variant in ("vit_b16_tome", "vit_b16_tome16"):
        tcfg = tome.VARIANTS[variant]

        def tome_fwd(p, x, tcfg=tcfg, want_attn=want_attn):
            out = tome.forward(p, x, tcfg, want_attn=want_attn)
            if want_attn:
                return out["logits"], out["attn"], out["rollout"]
            return out["logits"]

        sweep(f"{variant}_r{tcfg.r}", tome_fwd, bparams, tcfg.img_size,
              want_attn)

        def tome_fwd_kern(p, x, tcfg=tcfg, want_attn=want_attn):
            out = tome.forward(p, x, tcfg, want_attn=want_attn,
                               block_impl=block_impl)
            if want_attn:
                return out["logits"], out["attn"], out["rollout"]
            return out["logits"]

        sweep(f"{variant}_r{tcfg.r}_kern", tome_fwd_kern, bparams,
              tcfg.img_size, want_attn)

# -- 2. fidelity on the trained oracle checkpoint -------------------------------

CKPT = "/tmp/r3_oracle_ckpt/vit_t16_oracle.safetensors"
if not os.path.exists(CKPT):
    from interactive_vit_tpu.tools import train as T

    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    t0 = time.time()
    T.main([
        "--variant", "vit_t16", "--steps", "600", "--batch", "64",
        "--lr", "1e-3", "--warmup", "50", "--clip-norm", "1.0",
        "--memorize", "256", "--distinct-classes", "64",
        "--eval-every", "200", "--log-every", "100",
        "--export-safetensors", CKPT,
    ])
    emit(stage="trained_oracle", wall_s=round(time.time() - t0, 1))

from interactive_vit_tpu.tools.convert import convert  # noqa: E402
from interactive_vit_tpu.tools.train import pattern_set  # noqa: E402
from interactive_vit_tpu.utils.safetensors_io import load_file  # noqa: E402

tcfg0 = vit.VARIANTS["vit_t16"]
oracle = convert("vit_t16", "auto", load_file(CKPT))
images, labels = pattern_set(0, 256, tcfg0.img_size, tcfg0.num_classes, 64)


def eval_top1(fwd, params, dtype=jnp.bfloat16, batch=64):
    jitted = jax.jit(fwd)
    preds, margins = [], []
    for lo in range(0, len(labels), batch):
        x = jnp.asarray(images[lo:lo + batch], dtype)
        logits = np.asarray(jitted(params, x), np.float32)
        order = np.sort(logits, axis=-1)
        margins.append(order[:, -1] - order[:, -2])
        preds.append(logits.argmax(-1))
    return np.concatenate(preds), np.concatenate(margins)


op_bf16 = jax.tree.map(
    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x, oracle)
preds_dense, margins = eval_top1(
    lambda p, x: vit.forward(p, x, tcfg0)["logits"], op_bf16)
emit(stage="fidelity_dense", top1=float((preds_dense == labels).mean()),
     margin_p50=float(np.median(margins)),
     margin_p10=float(np.percentile(margins, 10)))

import dataclasses  # noqa: E402

for r in (4, 8, 16):
    tc = dataclasses.replace(
        tome.ToMeViTConfig(**{
            **{f.name: getattr(tcfg0, f.name)
               for f in dataclasses.fields(vit.ViTConfig)}}), r=r)
    preds, _ = eval_top1(
        lambda p, x, tc=tc: tome.forward(p, x, tc)["logits"], op_bf16)
    emit(stage="fidelity_tome", r=r,
         n_last=tc.n_tokens(tc.depth),
         top1=float((preds == labels).mean()),
         agreement_vs_dense=float((preds == preds_dense).mean()))

emit(stage="done")

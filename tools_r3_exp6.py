"""Verify the rollout-precision fix unblocks ViT-L maps-on, and measure.

Full ViT-L/16@384 maps-on (logits + 24 layers of [B,16,577,577] maps +
rollout) at batches 4/8/16, pinned layouts — the VERDICT item-4 config.
Then a ViT-B maps-on spot-check (the rollout precision change must not
regress the headline).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp6.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_attn_impl, default_block_impl
from interactive_vit_tpu.ops.layouts import row_major_out_shardings

emit(stage="start")


def sweep(variant, batches, iters=10):
    cfg = vit.VARIANTS[variant]
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    block_impl = default_block_impl("auto", dtype=jnp.bfloat16,
                                    n=cfg.tokens, d=cfg.width,
                                    heads=cfg.heads)
    attn_impl = default_attn_impl("auto")

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True,
                          attn_impl=attn_impl, block_impl=block_impl)
        return out["logits"], out["attn"], out["rollout"]

    for batch in batches:
        try:
            images = jnp.asarray(
                np.random.default_rng(0).random(
                    (batch, 3, cfg.img_size, cfg.img_size),
                    dtype=np.float32), jnp.bfloat16)
            sh = row_major_out_shardings(fn, params, images)
            jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                      else jax.jit(fn))
            t0 = time.perf_counter()
            jax.block_until_ready(jitted(params, images))
            cs = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jitted(params, images)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            emit(stage="sweep", variant=variant, batch=batch,
                 compile_s=round(cs, 1), ips=round(batch / dt, 1),
                 ms_per_batch=round(dt * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            emit(stage="error", variant=variant, batch=batch,
                 err=repr(e)[:200])


sweep("vit_l16", [4, 8, 16])
sweep("vit_b16", [32, 64])
emit(stage="done")

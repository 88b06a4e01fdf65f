"""dino_s8 (N=785) block_q experiment: full-row q vs the 256 fallback.

The row-resident kernel picks full-row q blocks only up to N=768
(flash_attention.py); dino_s8's 785 tokens just miss the cap and fall to
block_q=256, paying a K/V re-DMA per q block. This measures whether
raising the cap (full-row 792) wins at N=785, maps on and off, plus
intermediate block_q values.

Writes JSON lines to /tmp/r3_s8blockq.jsonl.
"""

import functools
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_s8blockq.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops import flash_attention as fa  # noqa: E402
from interactive_vit_tpu.ops.layouts import row_major_out_shardings  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

cfg = vit.VARIANTS["dino_s8"]
dtype = jnp.bfloat16
params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)


def run_cfg(block_q, want_attn, batch, iters=10):
    attn_impl = functools.partial(fa.flash_attention, block_q=block_q)

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=want_attn,
                          attn_impl=attn_impl, block_impl=None)
        if want_attn:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"]

    images = jnp.asarray(
        np.random.default_rng(0).random(
            (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32),
        dtype=dtype)
    try:
        sh = row_major_out_shardings(fn, params, images)
        jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                  else jax.jit(fn))
        jax.block_until_ready(jitted(params, images))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        emit(stage="sweep", block_q=block_q, maps=want_attn, batch=batch,
             ips=round(batch * iters / dt, 1),
             ms_per_batch=round(dt / iters * 1e3, 2))
    except Exception as e:  # noqa: BLE001
        emit(stage="error", block_q=block_q, maps=want_attn, batch=batch,
             err=repr(e)[:400])


# default today: block_q=256 at N=785 (the n<=768 cap misses by 17 rows)
for bq in [256, 392, 512, 792]:
    run_cfg(bq, True, 16)
for bq in [256, 512, 792]:
    run_cfg(bq, False, 32)

emit(stage="done")

"""Round-3: vit_moe_s16 single-chip throughput vs its dense twin.

Single-chip MoE context: top-1 routing gives vit_moe_s16 the same
active FLOPs per token as vit_s16's dense MLP, but the dispatch/combine
einsums add [S,E,C]-shaped matmuls and 8x the routed-MLP weight
traffic. This measures what that costs on one v5e (EP's benefit — more
total parameters per step-time — needs real multi-chip).

Emits JSONL to /tmp/r3_moe_bench.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_moe_bench.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import moe, vit  # noqa: E402
from interactive_vit_tpu.ops.dispatch import default_attn_impl  # noqa: E402
from interactive_vit_tpu.ops.layouts import (  # noqa: E402
    row_major_out_shardings,
)

attn_impl = default_attn_impl("auto")


def sweep(tag, cfg, fam, want_attn, batches):
    params = fam.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)

    def fn(p, images):
        out = fam.forward(p, images, cfg, want_attn=want_attn,
                          attn_impl=attn_impl)
        return (out["logits"], out["attn"]) if want_attn else out["logits"]

    for batch in batches:
        try:
            images = jnp.asarray(np.random.default_rng(0).random(
                (batch, 3, 224, 224), dtype=np.float32), jnp.bfloat16)
            sh = row_major_out_shardings(fn, params, images)
            jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                      else jax.jit(fn))
            jax.block_until_ready(jitted(params, images))
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jitted(params, images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            emit(stage="sweep", tag=tag, maps=want_attn, batch=batch,
                 ips=round(batch * iters / dt, 1),
                 ms_per_batch=round(dt / iters * 1e3, 2))
        except Exception as e:  # noqa: BLE001
            emit(stage="error", tag=tag, maps=want_attn, batch=batch,
                 err=repr(e)[:300])


BATCHES = (32, 64, 128)
sweep("vit_s16_dense", vit.VARIANTS["vit_s16"], vit, False, BATCHES)
sweep("vit_moe_s16", moe.VARIANTS["vit_moe_s16"], moe, False, BATCHES)
sweep("vit_s16_dense", vit.VARIANTS["vit_s16"], vit, True, BATCHES)
sweep("vit_moe_s16", moe.VARIANTS["vit_moe_s16"], moe, True, BATCHES)
emit(stage="done")

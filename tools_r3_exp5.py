"""ViT-L maps-on full-model compile bisect: depth sweep (single TPU proc).

The isolated headwise kernel compiles in every config (exp4); the failure
only appears in the full model. Bisect the transformer depth at otherwise
identical ViT-L/16@384 shapes, maps-on, batch 4.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp5.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_attn_impl, default_block_impl

emit(stage="start")


def try_depth(depth, batch=4, rollout=True, iters=5):
    cfg = vit.ViTConfig(f"l{depth}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    block_impl = default_block_impl("auto", dtype=jnp.bfloat16,
                                    n=cfg.tokens, d=cfg.width,
                                    heads=cfg.heads)
    attn_impl = default_attn_impl("auto")

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True,
                          attn_impl=attn_impl, block_impl=block_impl)
        if rollout:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"], out["attn"]

    images = jnp.asarray(
        np.random.default_rng(0).random((batch, 3, 384, 384),
                                        dtype=np.float32), jnp.bfloat16)
    try:
        t0 = time.perf_counter()
        jitted = jax.jit(fn)
        out = jitted(params, images)
        jax.block_until_ready(out)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        emit(stage="depth", depth=depth, batch=batch, rollout=rollout,
             ok=True, compile_s=round(cs, 1),
             ips=round(batch / dt, 1))
        return True
    except Exception as e:  # noqa: BLE001
        emit(stage="depth", depth=depth, batch=batch, rollout=rollout,
             ok=False, err=repr(e)[:200])
        return False


ok6 = try_depth(6)
ok12 = try_depth(12)
if ok12:
    ok18 = try_depth(18)
    if ok18:
        try_depth(24)
        try_depth(24, rollout=False)
else:
    try_depth(12, rollout=False)

emit(stage="done")

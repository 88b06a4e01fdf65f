"""Ladder: find the minimal full-model structure that kills the compiler.

vit_l-shaped (d=1024, h=16, n=577) with the headwise kernel; add
ingredients one at a time: depth, embed, head, multi-layer rollout chain.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp9.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_block as fb
from interactive_vit_tpu.ops.attention import attention_rollout
from interactive_vit_tpu.ops.dispatch import default_block_impl

emit(stage="start")

B = 4


def try_case(tag, fn, *args):
    try:
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        emit(stage="case", tag=tag, ok=True,
             compile_s=round(time.perf_counter() - t0, 1))
        return True
    except Exception as e:  # noqa: BLE001
        emit(stage="case", tag=tag, ok=False, err=repr(e)[:160])
        return False


def full_forward_case(depth):
    cfg = vit.ViTConfig(f"lx{depth}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                            d=cfg.width, heads=cfg.heads)
    images = jnp.asarray(np.random.default_rng(0).random(
        (B, 3, 384, 384), dtype=np.float32), jnp.bfloat16)

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True,
                          block_impl=bi)
        return out["logits"], out["attn"], out["rollout"]

    return fn, params, images


def blocks_only_case(depth, with_rollout, with_mlp=True):
    cfg = vit.ViTConfig(f"lb{depth}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, cfg.tokens, 1024)), jnp.bfloat16)

    def fn(params, x):
        means, attns = [], []
        from interactive_vit_tpu.ops import layers as L

        for p in params["blocks"]:
            x, probs, mean = fb.headwise_attn_block(
                x, p, cfg.heads, want_attn=True, want_mean=True)
            if with_mlp:
                x = x + L.mlp(L.layer_norm(x, p["ln2_s"], p["ln2_b"],
                                           cfg.ln_eps), p)
            attns.append(probs)
            means.append(mean)
        outs = [x, tuple(attns)]
        if with_rollout:
            outs.append(attention_rollout(means))
        return tuple(outs)

    return fn, params, x


fn, p, im = full_forward_case(1)
ok1 = try_case("full_d1_rollout", fn, p, im)
fn, p, xx = blocks_only_case(2, with_rollout=True)
try_case("blocks_d2_mlp_rollout", fn, p, xx)
fn, p, xx = blocks_only_case(2, with_rollout=True, with_mlp=False)
try_case("blocks_d2_nomlp_rollout", fn, p, xx)
if not ok1:
    fn, p, xx = blocks_only_case(1, with_rollout=True)
    try_case("blocks_d1_mlp_rollout", fn, p, xx)

emit(stage="done")

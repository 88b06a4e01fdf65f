"""Minimal repro: headwise kernel mean tap -> rollout, one program.

Then workarounds: optimization_barrier between kernel and rollout;
rollout from the probs tap instead of the mean tap.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp8.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_block as fb
from interactive_vit_tpu.ops.attention import attention_rollout

emit(stage="start")

d, heads, n = 1024, 16, 577
params = vit.init_params(jax.random.key(0),
                         vit.ViTConfig("l1", 384, 16, d, 1, heads),
                         dtype=jnp.bfloat16)
p = params["blocks"][0]
x = jnp.asarray(np.random.default_rng(0).standard_normal((4, n, d)),
                jnp.bfloat16)


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


def combo_mean(x, p):
    y, probs, mean = fb.headwise_attn_block(x, p, heads, want_attn=True,
                                            want_mean=True)
    return y, probs, attention_rollout([mean])


def combo_mean_only_tap(x, p):
    y, probs, mean = fb.headwise_attn_block(x, p, heads, want_attn=False,
                                            want_mean=True)
    return y, attention_rollout([mean])


def combo_barrier(x, p):
    y, probs, mean = fb.headwise_attn_block(x, p, heads, want_attn=True,
                                            want_mean=True)
    mean = jax.lax.optimization_barrier(mean)
    return y, probs, attention_rollout([mean])


def combo_from_probs(x, p):
    y, probs = fb.headwise_attn_block(x, p, heads, want_attn=True,
                                      want_mean=False)
    return y, probs, attention_rollout([probs])


try_case("kernel_mean_rollout", combo_mean, x, p)
try_case("kernel_meanonly_rollout", combo_mean_only_tap, x, p)
try_case("kernel_mean_rollout_barrier", combo_barrier, x, p)
try_case("kernel_probs_rollout", combo_from_probs, x, p)

emit(stage="done")

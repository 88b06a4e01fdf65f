"""Isolate the exact rollout construct that kills the remote compiler.

attention_rollout alone, on synthetic [B,577,577] bf16 maps: vary N,
operand dtype, normalize step, chain length. Single TPU process.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp7.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.ops.attention import attention_rollout

emit(stage="start")


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


def mk_maps(n, layers, b=4, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.random((b, n, n)), dtype) for _ in range(layers)]


# the real thing at ViT-L shape
try_case("rollout_n577_l6", attention_rollout, mk_maps(577, 6))
# ViT-B shape sanity (known-good in the full model)
try_case("rollout_n197_l6", attention_rollout, mk_maps(197, 6))
# aligned N
try_case("rollout_n512_l6", attention_rollout, mk_maps(512, 6))
try_case("rollout_n576_l6", attention_rollout, mk_maps(576, 6))
# single step at 577
try_case("rollout_n577_l1", attention_rollout, mk_maps(577, 1))


# decomposed pieces at N=577
def just_eye(ms):
    n = ms[0].shape[-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32),
                            (ms[0].shape[0], n, n)) + ms[0].astype(jnp.float32)


def just_norm(ms):
    a = ms[0].astype(jnp.float32)
    return a / jnp.sum(a, axis=-1, keepdims=True)


def just_bmm(ms):
    a = ms[0].astype(jnp.float32)
    return jnp.einsum("bij,bjk->bik", a, a)


def bmm_bf16(ms):
    a = ms[0]
    return jnp.einsum("bij,bjk->bik", a, a,
                      preferred_element_type=jnp.float32)


ms577 = mk_maps(577, 1)
try_case("eye_577", just_eye, ms577)
try_case("norm_577", just_norm, ms577)
try_case("bmm_f32_577", just_bmm, ms577)
try_case("bmm_bf16_577", bmm_bf16, ms577)

emit(stage="done")

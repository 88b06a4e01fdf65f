"""Round-2 continuation, experiment batch 1 (single TPU process).

Runs, in one process (the TPU is exclusive-access through a flaky tunnel —
CLAUDE.md trap #1: batch long TPU experiments into ONE script):

  1. int8 vs bf16 matmul rate check (profiler device events)
  2. ViT-B/16 W8A8 throughput (batch 32/64, maps on)
  3. ViT-L/16@384 maps-on / maps-off sweeps (batch 8/16/32)
  4. profiler trace of the best ViT-L maps-off config

Writes JSON lines to /tmp/r3_exp1.jsonl and traces under /tmp/r3_traces/.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp1.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_attn_impl, default_block_impl
from interactive_vit_tpu.ops.layouts import row_major_out_shardings
from interactive_vit_tpu.tools.trace_agg import report

emit(stage="start", devices=str(jax.devices()))


# ---- 1. int8 vs bf16 matmul rate ------------------------------------------

def mm_rate_check():
    n = 4096
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def dot8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    @jax.jit
    def dotbf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    # warmup/compile
    jax.block_until_ready([dot8(a8, b8), dotbf(abf, bbf)])
    tdir = "/tmp/r3_traces/mm_rate"
    jax.profiler.start_trace(tdir)
    for _ in range(20):
        o1 = dot8(a8, b8)
    jax.block_until_ready(o1)
    for _ in range(20):
        o2 = dotbf(abf, bbf)
    jax.block_until_ready(o2)
    jax.profiler.stop_trace()
    r = report(tdir, top=10)
    emit(stage="mm_rate", report=r)


# ---- 2/3. model sweeps ------------------------------------------------------

def model_sweep(variant, dtype_name, want_attn, batches, iters=10,
                trace_batch=None):
    cfg = vit.VARIANTS[variant]
    dtype = jnp.bfloat16
    params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
    attn_impl = default_attn_impl("auto")
    if dtype_name == "int8w8a8":
        from interactive_vit_tpu.ops.quant import quantize_tree

        params = quantize_tree(params, mode="w8a8")
        block_impl = None
    else:
        block_impl = default_block_impl("auto", dtype=dtype, n=cfg.tokens,
                                        d=cfg.width, heads=cfg.heads)

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=want_attn,
                          attn_impl=attn_impl, block_impl=block_impl)
        if want_attn:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"]

    for batch in batches:
        try:
            images = jnp.asarray(
                np.random.default_rng(0).random(
                    (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32
                ), dtype=dtype)
            sh = row_major_out_shardings(fn, params, images)
            jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                      else jax.jit(fn))
            jax.block_until_ready(jitted(params, images))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jitted(params, images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ips = batch * iters / dt
            emit(stage="sweep", variant=variant, dtype=dtype_name,
                 maps=want_attn, batch=batch, ips=round(ips, 1),
                 ms_per_batch=round(dt / iters * 1e3, 2))
            if trace_batch == batch:
                tdir = f"/tmp/r3_traces/{variant}_{dtype_name}_m{int(want_attn)}_b{batch}"
                jax.profiler.start_trace(tdir)
                for _ in range(3):
                    out = jitted(params, images)
                jax.block_until_ready(out)
                jax.profiler.stop_trace()
                r = report(tdir, top=12)
                emit(stage="trace", variant=variant, dtype=dtype_name,
                     maps=want_attn, batch=batch, report=r)
        except Exception as e:  # noqa: BLE001 — keep the batch going
            emit(stage="error", variant=variant, dtype=dtype_name,
                 maps=want_attn, batch=batch, err=repr(e)[:500])


mm_rate_check()

# W8A8 ViT-B (maps on, same contract as headline; plus maps-off read)
model_sweep("vit_b16", "int8w8a8", True, [32, 64], trace_batch=32)
model_sweep("vit_b16", "int8w8a8", False, [32, 64])

# ViT-L/16@384 current state, maps off then on
model_sweep("vit_l16", "bf16", False, [8, 16, 32], trace_batch=16)
model_sweep("vit_l16", "bf16", True, [8, 16])

# ViT-L W8A8 (the MLP is an even bigger share at D=1024)
model_sweep("vit_l16", "int8w8a8", False, [8, 16, 32])

emit(stage="done")

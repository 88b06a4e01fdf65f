"""Round-2 continuation, experiment batch 2 (single TPU process).

  1. Mosaic int8 vs bf16 matmul kernel rate probe (the decisive question
     for a Pallas W8A8 MLP kernel: does Mosaic hit the 2x int8 MXU rate?)
  2. ViT-L/16@384 maps-on retry (batch 8/16) — batch-1 hit a transient
     remote-compile HTTP 500 last run
  3. ViT-B W8A8 restricted to the MLP (fc1/fc2) with the fused attention
     block kept — isolates the int8 matmul effect from the attention-path
     regression seen in batch 1
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/tmp/r3_exp2.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_attn_impl, default_block_impl
from interactive_vit_tpu.ops.layouts import row_major_out_shardings
from interactive_vit_tpu.tools.trace_agg import aggregate, report

emit(stage="start", devices=str(jax.devices()))


# ---- 1. Mosaic int8 matmul rate ------------------------------------------

def pallas_mm_probe():
    M = K = N = 2048
    TM = TN = 512

    def mm_s8(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.int32)

    def mm_bf(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32)

    def call(kernel, a, b, out_dtype):
        return pl.pallas_call(
            kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        )(a, b)

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    f8 = jax.jit(functools.partial(call, mm_s8, out_dtype=jnp.int32))
    fbf = jax.jit(functools.partial(call, mm_bf, out_dtype=jnp.float32))
    jax.block_until_ready([f8(a8, b8), fbf(abf, bbf)])

    tdir = "/tmp/r3_traces/pallas_mm"
    jax.profiler.start_trace(tdir)
    for _ in range(30):
        o1 = f8(a8, b8)
    jax.block_until_ready(o1)
    for _ in range(30):
        o2 = fbf(abf, bbf)
    jax.block_until_ready(o2)
    jax.profiler.stop_trace()
    _, by_name, counts = aggregate(tdir)
    emit(stage="pallas_mm", by_name={k: round(v, 1) for k, v in
                                     sorted(by_name.items(),
                                            key=lambda kv: -kv[1])[:8]},
         counts={k: counts[k] for k in list(counts)[:8]},
         note="mm_s8 vs mm_bf, 30 invocations each of 2048^3 "
              "(17.2 GFLOP); bf16 roofline ~87us, int8 2x ~44us")


# ---- model sweep helper (W8A8 names restricted) ---------------------------

def model_sweep(variant, tag, want_attn, batches, iters=10, w8a8_names=None,
                keep_block=True, trace_batch=None):
    cfg = vit.VARIANTS[variant]
    dtype = jnp.bfloat16
    params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
    attn_impl = default_attn_impl("auto")
    block_impl = default_block_impl("auto", dtype=dtype, n=cfg.tokens,
                                    d=cfg.width, heads=cfg.heads) \
        if keep_block else None
    if w8a8_names:
        from interactive_vit_tpu.ops.quant import quantize_tree

        params = quantize_tree(params, names=frozenset(w8a8_names),
                               mode="w8a8")

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
            emit(stage="sweep", variant=variant, tag=tag, maps=want_attn,
                 batch=batch, ips=round(batch * iters / dt, 1),
                 ms_per_batch=round(dt / iters * 1e3, 2))
            if trace_batch == batch:
                tdir = f"/tmp/r3_traces/{variant}_{tag}_m{int(want_attn)}_b{batch}"
                jax.profiler.start_trace(tdir)
                for _ in range(3):
                    out = jitted(params, images)
                jax.block_until_ready(out)
                jax.profiler.stop_trace()
                emit(stage="trace", variant=variant, tag=tag,
                     batch=batch, report=report(tdir, top=10))
        except Exception as e:  # noqa: BLE001
            emit(stage="error", variant=variant, tag=tag, maps=want_attn,
                 batch=batch, err=repr(e)[:300])


pallas_mm_probe()

# ViT-L maps-on retry (bf16, fused headwise kernel)
model_sweep("vit_l16", "bf16", True, [8, 16])

# W8A8 on the MLP only, fused attention block kept
model_sweep("vit_b16", "w8a8mlp", True, [32, 64], w8a8_names={"fc1_w", "fc2_w"},
            keep_block=True, trace_batch=32)

emit(stage="done")

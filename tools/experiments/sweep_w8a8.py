"""Round-2 continuation, experiment batch 3 (single TPU process).

  1. Mosaic int8 vs bf16 matmul rate, SEPARATE traces (batch-2's probe
     merged both under one event name)
  2. W8A8 Pallas MLP kernel: on-chip numerics vs the jnp W8A8 path
  3. ViT-B int8w8a8 mode (fused blocks + Pallas W8A8 MLP) sweep + trace
  4. ViT-L maps-on compile bisect: pinned vs unpinned layouts, batch 4/8
  5. ViT-L maps-off with the W8A8 MLP kernel (MLP is 40% of its FLOPs)
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUT = open("/tmp/r3_exp3.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_mlp as fm
from interactive_vit_tpu.ops import layers as L
from interactive_vit_tpu.ops import quant
from interactive_vit_tpu.ops.dispatch import (
    default_attn_impl, default_block_impl, default_mlp_impl,
)
from interactive_vit_tpu.ops.layouts import row_major_out_shardings
from interactive_vit_tpu.tools.trace_agg import aggregate, report

emit(stage="start", devices=str(jax.devices()))


# ---- 1. separate int8 / bf16 Pallas probes ---------------------------------

def pallas_mm_probe():
    M = K = N = 2048
    TM = TN = 512

    def mm(a_ref, b_ref, o_ref, *, acc):
        o_ref[...] = jax.lax.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=acc)

    def call(a, b, acc, out_dtype):
        return pl.pallas_call(
            functools.partial(mm, acc=acc),
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
    cases = {
        "s8": (jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8),
               jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8),
               jnp.int32),
        "bf16": (jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16),
                 jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16),
                 jnp.float32),
    }
    for name, (a, b, acc) in cases.items():
        f = jax.jit(functools.partial(call, acc=acc, out_dtype=acc))
        jax.block_until_ready(f(a, b))
        tdir = f"/tmp/r3_traces/pallas_mm_{name}"
        jax.profiler.start_trace(tdir)
        for _ in range(30):
            o = f(a, b)
        jax.block_until_ready(o)
        jax.profiler.stop_trace()
        _, by_name, counts = aggregate(tdir)
        top = sorted(by_name.items(), key=lambda kv: -kv[1])[:3]
        emit(stage="pallas_mm", dtype=name,
             per_call_us={k: round(v / max(counts[k], 1), 1) for k, v in top})


# ---- 2. W8A8 MLP kernel on-chip numerics -----------------------------------

def w8a8_kernel_numerics():
    cfg = vit.ViTConfig("probe", width=256, depth=1, heads=4)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    p = dict(params["blocks"][0])
    p["fc1_w"] = quant.quantize_weight(p["fc1_w"], mode="w8a8")
    p["fc2_w"] = quant.quantize_weight(p["fc2_w"], mode="w8a8")
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 128, 256)),
                    jnp.bfloat16)
    ref = x + L.mlp(L.layer_norm(x, p["ln2_s"], p["ln2_b"], cfg.ln_eps), p)
    got = fm.fused_mlp_w8a8_block(x, p, cfg.ln_eps, block_q=128)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    emit(stage="w8a8_kernel_numerics", max_abs_err=err, ref_scale=scale,
         rel=err / scale)


# ---- 3/4/5. model sweeps ----------------------------------------------------

def model_sweep(variant, tag, want_attn, batches, iters=10, w8a8=False,
                pin_layouts=True, trace_batch=None):
    cfg = vit.VARIANTS[variant]
    dtype = jnp.bfloat16
    params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
    attn_impl = default_attn_impl("auto")
    block_impl = default_block_impl("auto", dtype=dtype, n=cfg.tokens,
                                    d=cfg.width, heads=cfg.heads)
    mlp_impl = None
    if w8a8:
        params = quant.quantize_tree(
            params, names=frozenset({"fc1_w", "fc2_w"}), mode="w8a8")
        mlp_impl = default_mlp_impl("auto", dtype=dtype, d=cfg.width,
                                    mlp_dim=cfg.mlp_dim, quant="w8a8")
        assert mlp_impl is not None

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=want_attn,
                          attn_impl=attn_impl, block_impl=block_impl,
                          mlp_impl=mlp_impl)
        if want_attn:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"]

    for batch in batches:
        try:
            images = jnp.asarray(
                np.random.default_rng(0).random(
                    (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32
                ), dtype=dtype)
            if pin_layouts:
                sh = row_major_out_shardings(fn, params, images)
                jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                          else jax.jit(fn))
            else:
                jitted = jax.jit(fn)
            jax.block_until_ready(jitted(params, images))
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jitted(params, images)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            emit(stage="sweep", variant=variant, tag=tag, maps=want_attn,
                 batch=batch, pin=pin_layouts,
                 ips=round(batch * iters / dt, 1),
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
                 batch=batch, pin=pin_layouts, err=repr(e)[:300])


pallas_mm_probe()
w8a8_kernel_numerics()

# ViT-B full int8w8a8 mode (fused blocks + Pallas W8A8 MLP)
model_sweep("vit_b16", "w8a8kern", True, [32, 64, 128], w8a8=True,
            trace_batch=64)

# ViT-L maps-on bisect
model_sweep("vit_l16", "bf16nopin", True, [8], pin_layouts=False)
model_sweep("vit_l16", "bf16", True, [4], pin_layouts=True)

# ViT-L maps-off with W8A8 MLP
model_sweep("vit_l16", "w8a8kern", False, [16, 32], w8a8=True)

emit(stage="done")

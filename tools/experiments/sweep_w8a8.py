"""Round-2 continuation, experiment batch 3 (single TPU process).

  1. Mosaic int8 vs bf16 matmul rate, SEPARATE traces (batch-2's probe
     merged both under one event name)
  2. W8A8 Pallas MLP kernel: on-chip numerics vs the jnp W8A8 path
  3. ViT-B int8w8a8 mode (fused blocks + Pallas W8A8 MLP) sweep + trace
  4. ViT-L maps-on compile bisect: pinned vs unpinned layouts, batch 4/8
  5. ViT-L maps-off with the W8A8 MLP kernel (MLP is 40% of its FLOPs)

Writes JSON lines to /tmp/r3_exp3.jsonl and traces under /tmp/r3_traces/.
Shared loop: tools/experiments/_harness.py.
"""

import functools

import numpy as np

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_exp3.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops import fused_mlp as fm  # noqa: E402
from interactive_vit_tpu.ops import layers as L  # noqa: E402
from interactive_vit_tpu.ops import quant  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import aggregate  # noqa: E402

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


pallas_mm_probe()
w8a8_kernel_numerics()

# ViT-B full int8w8a8 mode (fused blocks + Pallas W8A8 MLP)
model_sweep(emit, "vit_b16", "w8a8kern", True, [32, 64, 128],
            quant="mlp_w8a8", trace_batch=64)

# ViT-L maps-on bisect
model_sweep(emit, "vit_l16", "bf16nopin", True, [8], pin_layouts=False)
model_sweep(emit, "vit_l16", "bf16", True, [4], pin_layouts=True)

# ViT-L maps-off with W8A8 MLP
model_sweep(emit, "vit_l16", "w8a8kern", False, [16, 32], quant="mlp_w8a8")

emit(stage="done")

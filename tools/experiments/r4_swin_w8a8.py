"""Round-4: Swin W8A8 MLP on the v5e.

The ViT W8A8 MLP kernel (measured +6.7% maps-on over bf16 at ViT-B)
now drops into swin's blocks per stage (models/swin_plugin.py
quantize="w8a8": fc1/fc2 int8, fused window attention stays dense).
Measure: (1) on-chip parity of the kernel path vs the XLA W8A8
reference, (2) honest throughput swin_t bf16-dense vs W8A8, maps
off/on, batches 64/128 (device_get-forced; same harness as
r3_swin_kernel_tpu.py). JSONL to /tmp/r4_swin_w8a8.jsonl.
"""

import functools
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r4_swin_w8a8.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import swin  # noqa: E402
from interactive_vit_tpu.ops import fused_window as fw  # noqa: E402
from interactive_vit_tpu.ops.dispatch import default_mlp_impl  # noqa: E402
from interactive_vit_tpu.ops.layouts import (  # noqa: E402
    row_major_out_shardings,
)
from interactive_vit_tpu.ops.quant import quantize_tree  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

cfg = swin.VARIANTS["swin_t"]
dtype = jnp.bfloat16
params = swin.init_params(jax.random.key(0), cfg, dtype=dtype)
qparams = quantize_tree(params, names=frozenset({"fc1_w", "fc2_w"}),
                        mode="w8a8")
mlp_impls = [default_mlp_impl("w8a8", dtype=dtype, d=cfg.stage_dim(s),
                              mlp_dim=cfg.stage_dim(s) * cfg.mlp_ratio)
             for s in range(len(cfg.depths))]
emit(stage="impls", per_stage=[i is not None for i in mlp_impls])

# -- parity: kernel path vs XLA W8A8 reference, on-chip -----------------------
x4 = jnp.asarray(np.random.default_rng(1).random(
    (4, 3, 224, 224), dtype=np.float32), dtype)


def fwd(p, x, impls):
    return swin.forward(p, x, cfg, window_impl=fw.fused_window_attn,
                        mlp_impls=impls)["logits"]


lk = np.asarray(jax.device_get(
    jax.jit(functools.partial(fwd, impls=mlp_impls))(qparams, x4)),
    np.float32)
lr = np.asarray(jax.device_get(
    jax.jit(functools.partial(fwd, impls=None))(qparams, x4)), np.float32)
ld = np.asarray(jax.device_get(
    jax.jit(functools.partial(fwd, impls=None))(params, x4)), np.float32)
emit(stage="parity",
     kernel_vs_xla_w8a8_max=float(np.max(np.abs(lk - lr))),
     w8a8_vs_dense_max=float(np.max(np.abs(lk - ld))),
     logit_spread=float(np.ptp(ld)),
     top1_agree_dense=float((lk.argmax(-1) == ld.argmax(-1)).mean()))

# -- throughput ---------------------------------------------------------------
for name, p, impls in (("bf16", params, None),
                       ("w8a8", qparams, mlp_impls),
                       ("w8a8_xla", qparams, None)):
    for maps in (False, True):

        def fn(pp, images, _maps=maps, _impls=impls):
            out = swin.forward(pp, images, cfg, want_attn=_maps,
                               window_impl=fw.fused_window_attn,
                               mlp_impls=_impls)
            if _maps:
                return out["logits"], out["attn"]
            return out["logits"]

        for batch in (64, 128):
            try:
                images = jnp.asarray(np.random.default_rng(0).random(
                    (batch, 3, 224, 224), dtype=np.float32), dtype)
                sh = row_major_out_shardings(fn, p, images)
                jitted = (jax.jit(fn, out_shardings=sh)
                          if sh is not None else jax.jit(fn))
                t0 = time.perf_counter()
                jax.block_until_ready(jitted(p, images))
                compile_s = time.perf_counter() - t0
                iters = 10
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = jitted(p, images)
                jax.device_get(jax.tree.leaves(out)[0][:1])
                dt = time.perf_counter() - t0
                emit(stage="sweep", mode=name, maps=maps, batch=batch,
                     ips=round(batch * iters / dt, 1),
                     ms_per_batch=round(dt / iters * 1e3, 2),
                     compile_s=round(compile_s, 1))
            except Exception as e:
                emit(stage="error", mode=name, maps=maps, batch=batch,
                     error=str(e)[:800])

emit(stage="done")

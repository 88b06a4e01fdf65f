"""Round-3: on-chip A/B of gradient accumulation and the dots remat policy.

The packed flash-VJP kernel left ViT-L/16@384 @ batch 32 at 385.7 ms
with FULL per-block remat (auto_remat: no-remat activations breach HBM
at any useful batch).  Two new knobs attack the remat tax itself:

- ``remat="dots"`` (jax.checkpoint dots_with_no_batch_dims_saveable):
  save matmul outputs, recompute only the elementwise chains — drops
  most of remat's extra matmul FLOPs while still shedding the
  elementwise intermediates.
- ``accum_steps=k``: sequential microbatches under lax.scan (f32 grad
  accumulation, one optimizer update).  Activation memory scales with
  B/k, so a small-enough microbatch lets remat turn OFF entirely
  (3x forward+backward FLOPs instead of 4x) at the same effective
  batch.  auto_remat's estimate says ViT-L@384 no-remat fits at
  microbatch ~8.

Order matters: potentially-OOMing cases run LAST — one real
RESOURCE_EXHAUSTED poisons every later allocation in the process
(docs/kernels.md, 2026-08-17).

Emits JSONL to /tmp/r3_accum.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_accum.jsonl")

import jax  # noqa: E402

setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from bench import (  # noqa: E402
    V5E_BF16_PEAK_FLOPS as PEAK, _forward_gflops as forward_gflops,
)
from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops.attention_vjp import (  # noqa: E402
    trainable_flash_mhsa,
)
from interactive_vit_tpu.parallel.mesh import (  # noqa: E402
    permute_qkv_head_major,
)
from interactive_vit_tpu.parallel.train import (  # noqa: E402
    make_optimizer, make_train_step,
)


def run_case(variant: str, batch: int, remat, accum: int, label: str):
    cfg = vit.VARIANTS[variant]
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    params = permute_qkv_head_major(params, cfg.heads)  # packed kernel
    opt = make_optimizer(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(
        make_train_step(cfg, opt, attn_impl=trainable_flash_mhsa,
                        remat=remat, qkv_head_major=True,
                        accum_steps=accum),
        donate_argnums=(0, 1))
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.random((batch, 3, cfg.img_size, cfg.img_size), np.float32),
        dtype=jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, batch),
                         dtype=jnp.int32)
    p, s = params, opt_state
    t0 = time.perf_counter()
    for _ in range(2):
        p, s, loss = step(p, s, images, labels)
    loss0 = float(jax.device_get(loss))
    compile_s = time.perf_counter() - t0

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        p, s, loss = step(p, s, images, labels)
    jax.device_get(loss)
    wall = (time.perf_counter() - t0) / n_steps
    gf = forward_gflops(cfg)
    # matmul-FLOPs multiple of one forward: full remat re-runs the
    # forward's dots in backward (4x); remat off and "dots" (saved dot
    # outputs) both run them once (3x — elementwise recompute carries
    # no MXU FLOPs)
    flops_mult = 4.0 if remat is True else 3.0
    mfu = batch * gf * 1e9 * flops_mult / wall / PEAK
    out = dict(stage="train", variant=variant, batch=batch, label=label,
               remat=str(remat), accum=accum,
               step_ms=round(wall * 1e3, 1),
               imgs_s=round(batch / wall, 1), loss2=round(loss0, 4),
               mfu=round(mfu, 4), compile_s=round(compile_s, 1))
    emit(**out)
    del p, s, params, opt_state, step
    return out


# (variant, batch, remat, accum, label) — OOM-risky cases last
CASES = (
    ("vit_b16", 128, False, 1, "b16-off-control"),
    ("vit_b16", 128, "dots", 1, "b16-dots"),
    ("vit_l16", 32, True, 1, "l16-remat-control"),
    ("vit_l16", 32, False, 4, "l16-accum4-noremat"),
    ("vit_l16", 32, "dots", 2, "l16-accum2-dots"),
    ("vit_l16", 64, True, 2, "l16-b64-accum2-remat"),
    # risky tail: fit unknown, a real OOM poisons the process
    ("vit_l16", 32, "dots", 1, "l16-dots"),
    ("vit_l16", 32, False, 2, "l16-accum2-noremat"),
)

import os  # noqa: E402

ONLY = os.environ.get("IVT_ONLY", "")

for variant, batch, remat, accum, label in CASES:
    if ONLY and label not in ONLY.split(","):
        continue
    try:
        run_case(variant, batch, remat, accum, label)
    except Exception as err:  # noqa: BLE001 — record, keep sweeping
        emit(stage="error", variant=variant, batch=batch, label=label,
             err=str(err)[:500])

emit(stage="done")

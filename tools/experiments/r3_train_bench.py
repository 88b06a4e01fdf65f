"""Round-3: single-chip training throughput (steps/s, imgs/s, MFU).

The reference has no training at all (``torch.no_grad`` everywhere,
``/root/reference/main/context.py:79-88``); our trainer
(``parallel/train.make_train_step``: value_and_grad + AdamW, per-block
remat) is exercised functionally by the oracle runs — this measures its
SPEED on the real chip so training regressions become visible.

Protocol: synthetic data (no loader noise), bf16 params, remat on (the
production large-batch config), steady state over 20 steps after 2
warmup steps. MFU counts fwd+bwd = 3x forward FLOPs, +1 extra forward
for remat (per-block checkpointing recomputes the block forwards in the
backward) = 4x, against the v5e bf16 peak (197 TFLOP/s).

Emits JSONL to /tmp/r3_train.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_train.jsonl")

import jax  # noqa: E402

setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from bench import (  # noqa: E402 — repo-root module (_harness sys.path)
    V5E_BF16_PEAK_FLOPS as PEAK, _forward_gflops as forward_gflops,
)
from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.parallel.train import (  # noqa: E402
    make_optimizer, make_train_step,
)


for variant, batches in (("vit_s16", (128, 256)), ("vit_b16", (64, 128))):
    cfg = vit.VARIANTS[variant]
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, remat=True),
                   donate_argnums=(0, 1))
    gf = forward_gflops(cfg)
    for batch in batches:
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.random((batch, 3, cfg.img_size, cfg.img_size),
                       dtype=np.float32), dtype=jnp.bfloat16)
        labels = jnp.asarray(
            rng.integers(0, cfg.num_classes, batch), dtype=jnp.int32)
        p, s = params, opt_state
        t0 = time.perf_counter()
        try:
            for _ in range(2):
                p, s, loss = step(p, s, images, labels)
            jax.block_until_ready(loss)
        except Exception as err:  # noqa: BLE001 — OOM case: report, move on
            emit(stage="train", variant=variant, batch=batch,
                 error=str(err)[:300])
            # trap (docs/kernels.md): one OOM poisons later allocations
            # in this process — stop rather than emit garbage
            raise SystemExit(1)
        compile_s = time.perf_counter() - t0
        ITERS = 20
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p, s, loss = step(p, s, images, labels)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / ITERS
        ips = batch / dt
        mfu = ips * gf * 4 / (PEAK / 1e9)
        emit(stage="train", variant=variant, batch=batch,
             step_ms=round(dt * 1e3, 1), imgs_s=round(ips, 1),
             loss=round(float(loss), 3),
             gflops_img_fwd=round(gf, 1), mfu_4x=round(mfu, 4),
             compile_s=round(compile_s, 1))
        # fresh state per batch size (donated buffers were consumed)
        params = vit.init_params(jax.random.key(0), cfg,
                                 dtype=jnp.bfloat16)
        opt_state = opt.init(params)

emit(stage="done")

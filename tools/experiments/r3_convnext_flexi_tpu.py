"""Round-3: (a) ConvNeXt-T throughput on the v5e (the modern-conv
datapoint: NHWC-internal blocks, channel-last MXU MLPs), (b) the
FlexiViT patch-size trade on chip — one vit_b16 checkpoint served at
@p32 / native p16 / @p8 (token counts 50 / 197 / 785).

Emits JSONL to /tmp/r3_convnext_flexi.jsonl. Single process
(CLAUDE.md trap #1); wall timing forces completion via device_get
(trap #10 — full-model steps self-throttle, so walls are honest).
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_convnext_flexi.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import convnext, vit  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

dtype = jnp.bfloat16


def sweep(tag, fn, params, batches, img, trace_at=None):
    for batch in batches:
        try:
            images = jnp.asarray(
                np.random.default_rng(0).random((batch, 3, img, img),
                                                dtype=np.float32), dtype)
            jax.block_until_ready(fn(params, images))
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(params, images)
            jax.device_get(out[:1])
            dt = time.perf_counter() - t0
            emit(stage="sweep", model=tag, batch=batch,
                 ips=round(batch * iters / dt, 1),
                 ms_per_batch=round(dt / iters * 1e3, 2))
            if trace_at == batch:
                tdir = f"/tmp/r3_traces/{tag}_b{batch}"
                jax.profiler.start_trace(tdir)
                for _ in range(3):
                    out = fn(params, images)
                jax.device_get(out[:1])
                jax.profiler.stop_trace()
                emit(stage="trace", model=tag, batch=batch,
                     report=report(tdir, top=8))
        except Exception as e:  # noqa: BLE001
            emit(stage="error", model=tag, batch=batch, err=repr(e)[:400])


# ---- (a) ConvNeXt-T ------------------------------------------------------
cn_cfg = convnext.VARIANTS["convnext_t"]
cn_params = convnext.init_params(jax.random.key(0), cn_cfg, dtype=dtype)


@jax.jit
def cn_fn(p, x):
    return convnext.forward(p, x, cn_cfg)


sweep("convnext_t", cn_fn, cn_params, (32, 64, 128, 256), 224,
      trace_at=128)

# ---- (b) FlexiViT patch trade: ONE checkpoint, three patch sizes ---------
native = vit.init_params(jax.random.key(1), vit.VARIANTS["vit_b16"],
                         dtype=dtype)
for name in ("vit_b16@p32", "vit_b16", "vit_b16@p8"):
    cfg = vit.resolve_variant(name)
    params = vit.adapt_checkpoint(dict(native), cfg)

    def fn(p, x, cfg=cfg):
        return vit.forward(p, x, cfg)["logits"]

    fn = jax.jit(fn)
    batches = (32, 128) if cfg.patch >= 16 else (8, 32)
    sweep(name, fn, params, batches, 224)

emit(stage="done")

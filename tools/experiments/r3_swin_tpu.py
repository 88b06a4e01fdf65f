"""Round-3: Swin-T/S throughput on the v5e (hierarchical-window family).

Swin's compute is windowed attention over 49-token tiles plus patch-
merging matmuls — a very different MXU shape mix from ViT's N=197
global attention (many small [*,49,49] dots batched over windows x
heads). Records imgs/s at 224 px bf16 across batches, maps off and on
(want_attn ships every block's [B,win,h,49,49] probs), plus one
profiler trace for the MXU-share breakdown. JSONL to /tmp/r3_swin.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_swin.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import swin  # noqa: E402
from interactive_vit_tpu.ops.layouts import row_major_out_shardings  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

for variant in ("swin_t", "swin_s"):
    cfg = swin.VARIANTS[variant]
    dtype = jnp.bfloat16
    params = swin.init_params(jax.random.key(0), cfg, dtype=dtype)

    for maps in (False, True):

        def fn(params, images, _maps=maps, _cfg=cfg):
            out = swin.forward(params, images, _cfg, want_attn=_maps)
            if _maps:
                return out["logits"], out["attn"]
            return out["logits"]

        for batch in (32, 64, 96, 128):
            try:
                images = jnp.asarray(
                    np.random.default_rng(0).random(
                        (batch, 3, 224, 224), dtype=np.float32), dtype)
                sh = row_major_out_shardings(fn, params, images)
                jitted = (jax.jit(fn, out_shardings=sh)
                          if sh is not None else jax.jit(fn))
                t0 = time.perf_counter()
                jax.block_until_ready(jitted(params, images))
                compile_s = time.perf_counter() - t0
                iters = 10
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = jitted(params, images)
                # device_get forces real completion: block_until_ready
                # can return before the device executes on this backend
                # (CLAUDE.md trap #9 — first run read 175k "imgs/s")
                jax.device_get(jax.tree.leaves(out)[0][:1])
                dt = time.perf_counter() - t0
                emit(stage="sweep", variant=variant, maps=maps, batch=batch,
                     ips=round(batch * iters / dt, 1),
                     ms_per_batch=round(dt / iters * 1e3, 2),
                     compile_s=round(compile_s, 1))
                if variant == "swin_t" and not maps and batch == 128:
                    tdir = "/tmp/r3_traces/swin_t_b128"
                    jax.profiler.start_trace(tdir)
                    for _ in range(3):
                        out = jitted(params, images)
                    jax.block_until_ready(out)
                    jax.profiler.stop_trace()
                    emit(stage="trace", variant=variant, batch=batch,
                         report=report(tdir, top=10))
            except Exception as e:  # one OOM must not kill the sweep
                emit(stage="error", variant=variant, maps=maps, batch=batch,
                     error=str(e)[:500])

emit(stage="done")

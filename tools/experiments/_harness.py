"""Shared scaffolding for the one-process TPU experiment scripts.

The TPU is exclusive-access through a flaky tunnel (CLAUDE.md trap #1), so
experiments batch into ONE long-running script; this module holds the parts
every such script repeats — JSONL emission, jax compilation-cache setup,
and the steady-state model sweep loop — so the harnesses can't drift apart
(they did: tag-vs-dtype field names, pin_layouts present in one copy).

Timing caveat: wall clocks here are full-model steps, which self-throttle
via dispatch backpressure and stay roughly honest (CLAUDE.md trap #7);
sub-ms conclusions must come from the profiler traces (`trace_batch=`,
aggregated with tools.trace_agg — which by default reads only the newest
profile subdir, so re-running after a tunnel flake won't double-count).
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterable, Optional

import numpy as np

# scripts here run as files (sys.path[0] = this dir); make the repo root
# importable regardless of cwd
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def make_emit(path: str):
    """JSONL emitter: every record to stdout AND appended to ``path``
    (append mode so a tunnel-flake rerun keeps earlier records)."""
    out = open(path, "a", buffering=1)

    def emit(**kw):
        line = json.dumps(kw)
        print(line, flush=True)
        out.write(line + "\n")

    return emit


def setup_jax():
    """Persistent compilation cache: reruns skip the 10-30s compiles, and
    a flaky-tunnel compile stall can't eat the whole experiment."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def model_sweep(
    emit,
    variant: str,
    tag: str,
    want_attn: bool,
    batches: Iterable[int],
    *,
    iters: int = 10,
    quant: Optional[str] = None,
    pin_layouts: bool = True,
    trace_batch: Optional[int] = None,
    trace_root: str = "/tmp/r3_traces",
):
    """Steady-state throughput sweep of one ViT configuration.

    ``quant``:
      None         — bf16, fused block kernel (the headline config)
      "naive_w8a8" — full-tree W8A8 through the XLA quantize-chain path,
                     block_impl=None (the measured-loss control)
      "mlp_w8a8"   — fc1/fc2 W8A8 via the Pallas in-VMEM kernel, fused
                     attention block kept dense (the shipping --dtype
                     int8w8a8 configuration)
    Per-batch failures are caught and emitted as ``stage="error"`` records
    so one OOM doesn't kill the remaining sweep points.
    """
    import jax
    import jax.numpy as jnp

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops.dispatch import (
        default_attn_impl, default_block_impl, default_mlp_impl,
    )
    from interactive_vit_tpu.ops.layouts import row_major_out_shardings
    from interactive_vit_tpu.ops.quant import quantize_tree
    from interactive_vit_tpu.tools.trace_agg import report

    cfg = vit.VARIANTS[variant]
    dtype = jnp.bfloat16
    params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
    attn_impl = default_attn_impl("auto")
    mlp_impl = None
    if quant == "naive_w8a8":
        params = quantize_tree(params, mode="w8a8")
        block_impl = None
    else:
        block_impl = default_block_impl("auto", dtype=dtype, n=cfg.tokens,
                                        d=cfg.width, heads=cfg.heads)
        if quant == "mlp_w8a8":
            params = quantize_tree(
                params, names=frozenset({"fc1_w", "fc2_w"}), mode="w8a8")
            mlp_impl = default_mlp_impl("auto", dtype=dtype, d=cfg.width,
                                        mlp_dim=cfg.mlp_dim, quant="w8a8")
            assert mlp_impl is not None, "W8A8 MLP kernel must fit here"
        elif quant is not None:
            raise ValueError(f"unknown quant mode {quant!r}")

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
                 batch=batch, pin=pin_layouts, quant=quant,
                 ips=round(batch * iters / dt, 1),
                 ms_per_batch=round(dt / iters * 1e3, 2))
            if trace_batch == batch:
                tdir = (f"{trace_root}/{variant}_{tag}"
                        f"_m{int(want_attn)}_b{batch}")
                jax.profiler.start_trace(tdir)
                for _ in range(3):
                    out = jitted(params, images)
                jax.block_until_ready(out)
                jax.profiler.stop_trace()
                emit(stage="trace", variant=variant, tag=tag, maps=want_attn,
                     batch=batch, report=report(tdir, top=12))
        except Exception as e:  # noqa: BLE001 — keep the batch going
            emit(stage="error", variant=variant, tag=tag, maps=want_attn,
                 batch=batch, pin=pin_layouts, quant=quant,
                 err=repr(e)[:500])

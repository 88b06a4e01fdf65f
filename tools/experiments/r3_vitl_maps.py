"""Round-3: un-OOM ViT-L/16@384 maps-on at batch 32 (VERDICT r2 #3).

The round-2 state: maps-on batch 32 HBM-OOMs (8.2 GB of bf16
[24,B,16,577,577] taps); maps-on 361-371 imgs/s @ batch 16. This script
measures, on the real chip:

  1. maps-on batch 16/24/32 FULL taps (with device memory stats, and
     with/without row-major tap pinning at 32 — the pinned relayout
     doubles peak tap memory if XLA can't fuse it);
  2. maps-on batch 32 with SELECTIVE taps (attn_heads=[0,5] — the
     "UI views 2 of 16 heads" product case, 8x less tap memory);
  3. rollout-only (head-mean taps, no per-head probs) batch 32.

Emits JSONL to /tmp/r3_vitl.jsonl.
"""

import sys
import time

import numpy as np

from _harness import make_emit, setup_jax

# Per-case SUBPROCESS isolation: a RESOURCE_EXHAUSTED on this remote
# backend poisons every subsequent allocation in the process (observed
# twice 2026-08-17: after full_maps@32 OOMed, even a 0.5 GB rollout-only
# case OOMed; in a fresh process it runs). Parent mode spawns one child
# per case; child mode runs exactly one.
if len(sys.argv) == 1:
    import subprocess

    cases = [
        "full_maps:16", "full_maps:24",
        "rollout_only:32", "rollout_only:48",
        "sel2_maps:32", "sel2_maps:48",
        "full_maps:32", "full_maps_nopin:32",  # riskiest LAST
    ]
    for c in cases:
        subprocess.run([sys.executable, __file__, c], timeout=900,
                       check=False)
    sys.exit(0)

if sys.argv[1] == "--single":
    # ONE process, ONE tunnel setup (per-case subprocesses each pay the
    # setup lottery — a bad phase starved 6 of 8 cases); the only
    # OOM-risky case (full maps @32) runs LAST so its poisoning effect
    # has nothing left to kill.
    ONLY = ["full_maps:16", "rollout_only:32", "sel2_maps:32",
            "rollout_only:48", "sel2_maps:48", "full_maps:32"]
else:
    ONLY = [sys.argv[1]]

emit = make_emit("/tmp/r3_vitl.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.ops.dispatch import (  # noqa: E402
    default_attn_impl, default_block_impl,
)
from interactive_vit_tpu.ops.layouts import row_major_out_shardings  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

cfg = vit.VARIANTS["vit_l16"]
dtype = jnp.bfloat16
params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
attn_impl = default_attn_impl("auto")
block_impl = default_block_impl("auto", dtype=dtype, n=cfg.tokens,
                                d=cfg.width, heads=cfg.heads)
emit(stage="impl", block_impl=getattr(block_impl, "__name__", None))


def mem_stats():
    try:
        s = jax.local_devices()[0].memory_stats()
        return {k: s.get(k) for k in
                ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception as e:  # noqa: BLE001
        return {"err": repr(e)[:120]}


def run_case(tag, batch, want_attn, attn_heads=None, pin=True, iters=6):
    try:
        def fn(params, images):
            out = vit.forward(params, images, cfg, want_attn=want_attn,
                              attn_impl=attn_impl, block_impl=block_impl,
                              attn_heads=attn_heads)
            if want_attn and attn_heads == ():
                return out["logits"], out["rollout"]  # rollout-only mode
            if want_attn:
                return out["logits"], out["attn"], out["rollout"]
            return out["logits"]

        images = jnp.asarray(
            np.random.default_rng(0).random(
                (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32),
            dtype=dtype)
        if pin:
            sh = row_major_out_shardings(fn, params, images)
            jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                      else jax.jit(fn))
        else:
            jitted = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(params, images))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        # device_get, not block_until_ready: on this backend
        # block_until_ready can return before the device executes
        # (CLAUDE.md trap #8 — a 42944 imgs/s ViT-L reading); fetching a
        # small leaf of the LAST dispatch forces the whole in-order queue
        jax.device_get(jax.tree.leaves(out)[0])
        dt = time.perf_counter() - t0
        emit(stage="case", tag=tag, batch=batch, maps=want_attn,
             heads=attn_heads, pin=pin,
             ips=round(batch * iters / dt, 1),
             ms_per_batch=round(dt / iters * 1e3, 2),
             compile_s=round(compile_s, 1), mem=mem_stats())
    except Exception as e:  # noqa: BLE001
        emit(stage="error", tag=tag, batch=batch, maps=want_attn,
             heads=attn_heads, pin=pin, err=repr(e)[:600],
             mem=mem_stats())


for case in ONLY:
    tag, b = case.split(":")
    b = int(b)
    if tag == "full_maps":
        run_case("full_maps", b, True)
    elif tag == "full_maps_nopin":
        run_case("full_maps_nopin", b, True, pin=False)
    elif tag == "sel2_maps":
        run_case("sel2_maps", b, True, attn_heads=(0, 5))
    elif tag == "rollout_only":
        run_case("rollout_only", b, True, attn_heads=())
    else:
        raise SystemExit(f"unknown case {case}")

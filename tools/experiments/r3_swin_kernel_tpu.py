"""Round-3: fused swin window-attention kernel on the v5e.

Two phases:
1. Per-shape parity/lowering probe — every distinct (stage, shift) kernel
   geometry of swin_t compiles and matches the XLA window path on-chip in
   bf16 (interpret-mode tests can't check Mosaic tiling; the key_bias
   rank-3 lesson, docs/kernels.md).
2. Honest throughput sweep (device_get-forced, CLAUDE.md trap #9):
   swin_t / swin_s, fused kernel vs XLA reference, maps off/on, plus one
   profiler trace for the data-formatting share the kernel is meant to
   kill (39.1 ms / 24% on the XLA path at swin_t b128).

JSONL to /tmp/r3_swin_kernel.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_swin_kernel.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import swin  # noqa: E402
from interactive_vit_tpu.ops import fused_window as fw  # noqa: E402
from interactive_vit_tpu.ops.layouts import row_major_out_shardings  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

# -- phase 1: per-shape parity + compile probe (swin_t, batch 4) -------------
cfg = swin.VARIANTS["swin_t"]
dtype = jnp.bfloat16
params = swin.init_params(jax.random.key(0), cfg, dtype=dtype)
rng = np.random.default_rng(0)

seen = set()
for s, depth in enumerate(cfg.depths):
    for b in range(depth):
        shift = cfg.stage_shift(s, b)
        key = (s, shift != 0)
        if key in seen:
            continue
        seen.add(key)
        res = cfg.stage_res(s)
        c = cfg.stage_dim(s)
        p = params["stages"][s][b]
        x = jnp.asarray(rng.standard_normal((4, res, res, c)), dtype)

        def run(impl, _p=p, _s=s, _shift=shift):
            def f(p, x):
                return swin.block(p, x, cfg, _s, _shift, want_attn=True,
                                  window_impl=impl)
            return jax.jit(f)

        try:
            t0 = time.perf_counter()
            got, probs = run(fw.fused_window_attn)(p, x)
            got, probs = jax.device_get((got, probs))
            compile_s = time.perf_counter() - t0
            ref, ref_probs = jax.device_get(run(None)(p, x))
            dy = float(np.max(np.abs(got.astype(np.float32)
                                     - ref.astype(np.float32))))
            dp = float(np.max(np.abs(probs.astype(np.float32)
                                     - ref_probs.astype(np.float32))))
            scale = float(np.max(np.abs(ref.astype(np.float32)))) or 1.0
            emit(stage="parity", stage_idx=s, shift=shift,
                 res=res, c=c, heads=cfg.heads[s],
                 max_dy=round(dy, 5), rel_dy=round(dy / scale, 5),
                 max_dprobs=round(dp, 5), compile_s=round(compile_s, 1),
                 ok=bool(dy / scale < 0.05 and dp < 0.05))
        except Exception as e:
            emit(stage="parity_error", stage_idx=s, shift=shift,
                 error=str(e)[:1500])

# -- phase 2: throughput sweep ------------------------------------------------
for variant in ("swin_t", "swin_s"):
    vcfg = swin.VARIANTS[variant]
    vparams = swin.init_params(jax.random.key(0), vcfg, dtype=dtype)
    for impl_name, impl in (("fused", fw.fused_window_attn), ("xla", None)):
        for maps in (False, True):

            def fn(params, images, _maps=maps, _cfg=vcfg, _impl=impl):
                out = swin.forward(params, images, _cfg, want_attn=_maps,
                                   window_impl=_impl)
                if _maps:
                    return out["logits"], out["attn"]
                return out["logits"]

            for batch in (64, 128):
                try:
                    images = jnp.asarray(
                        np.random.default_rng(0).random(
                            (batch, 3, 224, 224), dtype=np.float32), dtype)
                    sh = row_major_out_shardings(fn, vparams, images)
                    jitted = (jax.jit(fn, out_shardings=sh)
                              if sh is not None else jax.jit(fn))
                    t0 = time.perf_counter()
                    jax.block_until_ready(jitted(vparams, images))
                    compile_s = time.perf_counter() - t0
                    iters = 10
                    t0 = time.perf_counter()
                    for _ in range(iters):
                        out = jitted(vparams, images)
                    jax.device_get(jax.tree.leaves(out)[0][:1])
                    dt = time.perf_counter() - t0
                    emit(stage="sweep", variant=variant, impl=impl_name,
                         maps=maps, batch=batch,
                         ips=round(batch * iters / dt, 1),
                         ms_per_batch=round(dt / iters * 1e3, 2),
                         compile_s=round(compile_s, 1))
                    if (variant == "swin_t" and impl_name == "fused"
                            and batch == 128):
                        tdir = f"/tmp/r3_traces/swin_t_fused_b128_m{maps}"
                        jax.profiler.start_trace(tdir)
                        for _ in range(3):
                            out = jitted(vparams, images)
                        jax.block_until_ready(out)
                        jax.profiler.stop_trace()
                        emit(stage="trace", variant=variant, maps=maps,
                             report=report(tdir, top=10))
                except Exception as e:
                    emit(stage="error", variant=variant, impl=impl_name,
                         maps=maps, batch=batch, error=str(e)[:800])

emit(stage="done")

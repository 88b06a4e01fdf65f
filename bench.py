"""Headline benchmark: ViT-B/16 @224 inference with attention-map extraction.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "imgs/sec/chip", "vs_baseline": N}

vs_baseline is measured throughput / 2000 (the BASELINE.json north-star
target for TPU v5e; the reference app itself publishes no numbers —
BASELINE.md). Runs on whatever jax backend the environment provides (the
driver runs it on the real chip).

Protocol: bf16 weights+activations (native MXU path, f32 accumulation —
see ops/layers.mm_precision), want_attn=True so every layer's post-softmax
attention maps AND the attention rollout are extracted (the north star's
"full attention-map extraction"), steady-state timing over --iters batches
after a warmup/compile batch.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _wait_for_backend(tries: int = 5, probe_timeout: int = 240,
                      sleep_s: int = 120) -> None:
    """Bounded wait for a healthy TPU tunnel before the in-process jax
    backend initializes.

    The driver runs this script unattended at round end; the tunnel has
    measured multi-hour outage phases (ROADMAP) during which backend init
    hangs forever INSIDE this process — unkillable without losing the
    run. Probing from a SUBPROCESS with a timeout keeps the parent clean:
    retry a few times, then proceed regardless (a still-dead tunnel fails
    the same way it would have, just later)."""
    import os
    import subprocess

    probe = ("import jax; import jax.numpy as jnp; "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "(x @ x).block_until_ready(); print('BENCH_PROBE_OK')")
    for i in range(tries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                text=True, timeout=probe_timeout, env=dict(os.environ))
            if "BENCH_PROBE_OK" in r.stdout:
                if i:
                    print(f"backend healthy after {i} retries",
                          file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass
        if i < tries - 1:
            print(f"backend probe {i + 1}/{tries} failed; retrying in "
                  f"{sleep_s}s (flaky-tunnel phase?)", file=sys.stderr)
            time.sleep(sleep_s)
    print("backend never became healthy; proceeding anyway",
          file=sys.stderr)


# v5e dense bf16 MXU peak — the MFU denominator here AND in the training
# bench (tools/experiments/r3_train_bench.py imports both)
V5E_BF16_PEAK_FLOPS = 197e12


def _forward_gflops(cfg) -> float:
    """Analytic forward GFLOPs/image (mul+add = 2 FLOPs; conv-free ViT):
    patch embed + depth * (qkv/proj GEMMs + attention dots + MLP) + head.
    Attention-map extraction adds no FLOPs (the probs are computed
    anyway); softmax/LN/elementwise are ignored (<1%)."""
    n, d, p, depth = cfg.tokens, cfg.width, cfg.patch, cfg.depth
    mlp = getattr(cfg, "mlp_dim", 4 * d)
    embed = n * (3 * p * p) * d * 2
    per_block = (
        n * d * (3 * d) * 2      # qkv
        + 2 * n * n * d * 2      # scores + probs@V
        + n * d * d * 2          # proj
        + 2 * n * d * mlp * 2    # fc1 + fc2
    )
    head = d * getattr(cfg, "num_classes", 1000) * 2
    return (embed + depth * per_block + head) / 1e9


def measure(variant: str = "vit_b16", dtype_name: str = "bfloat16",
            batches=(32, 64, 96, 128), iters: int = 20,
            want_attn: bool = True, attn: str = "auto",
            block: str = "auto") -> dict:
    """One throughput measurement (the headline protocol), reusable by
    the multi-config round matrix (tools/bench_matrix.py).

    Returns {"imgs_per_s", "best_batch", "per_batch", "mfu", "ms_per_batch"}.
    Caller owns backend health + compilation-cache setup.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops.dispatch import (
        default_attn_impl, default_block_impl,
    )
    from interactive_vit_tpu.ops.layouts import row_major_out_shardings

    cfg = vit.VARIANTS[variant]
    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    params = vit.init_params(jax.random.key(0), cfg, dtype=dtype)
    attn_impl = default_attn_impl(attn)
    mlp_impl = None
    if dtype_name == "int8w8a8":
        from interactive_vit_tpu.ops.dispatch import default_mlp_impl
        from interactive_vit_tpu.ops.quant import quantize_tree

        params = quantize_tree(params, names=frozenset({"fc1_w", "fc2_w"}),
                               mode="w8a8")
        block_impl = default_block_impl(block, dtype=dtype, n=cfg.tokens,
                                        d=cfg.width, heads=cfg.heads)
        mlp_impl = default_mlp_impl("auto", dtype=dtype, d=cfg.width,
                                    mlp_dim=cfg.mlp_dim, quant="w8a8")
    else:
        block_impl = default_block_impl(block, dtype=dtype, n=cfg.tokens,
                                        d=cfg.width, heads=cfg.heads)

    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=want_attn,
                          attn_impl=attn_impl, block_impl=block_impl,
                          mlp_impl=mlp_impl)
        if want_attn:
            return out["logits"], out["attn"], out["rollout"]
        return out["logits"]

    per_batch = {}
    for batch in batches:
        images = jnp.asarray(
            np.random.default_rng(0).random(
                (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32),
            dtype=dtype)
        sh = row_major_out_shardings(fn, params, images)
        jitted = (jax.jit(fn, out_shardings=sh) if sh is not None
                  else jax.jit(fn))
        out = jitted(params, images)  # compile + warmup
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        per_batch[batch] = batch * iters / dt
        print(f"  {variant} batch={batch}: {per_batch[batch]:.1f} imgs/s "
              f"({dt / iters * 1e3:.2f} ms/batch)", file=sys.stderr)
    best_batch = max(per_batch, key=per_batch.get)
    best = per_batch[best_batch]
    mfu = None
    gflops = _forward_gflops(cfg)
    import jax

    if dtype_name != "float32" and any(
            d.platform == "tpu" for d in jax.devices()):
        mfu = round(best * gflops * 1e9 / V5E_BF16_PEAK_FLOPS, 4)
    return {"imgs_per_s": round(best, 1), "best_batch": best_batch,
            "per_batch": {str(k): round(v, 1)
                          for k, v in per_batch.items()},
            "ms_per_batch": round(best_batch / best * 1e3, 2),
            "gflops_per_img": round(gflops, 1), "mfu": mfu}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="vit_b16")
    parser.add_argument(
        "--batch", type=int, default=0,
        help="batch size; 0 (default) = sweep {32,64,96,128} and report "
             "the best (the knee moved 32 -> 64 after the tap relayout "
             "fixes, then to 96 — measured 4224-4377 imgs/s there vs "
             "~4050 at 64/112/128; sweeping is robust to tunnel noise)",
    )
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["bfloat16", "float32", "int8w8a8"],
                        help="int8w8a8: dynamic-activation int8 matmuls "
                             "(2x MXU rate on v5e) over bf16 — NOT the "
                             "headline numeric class; opt-in measurement")
    parser.add_argument("--attn", default="auto",
                        choices=["auto", "flash", "reference"])
    parser.add_argument("--block", default="auto",
                        choices=["auto", "fused", "none", "int8-scores",
                                 "int8-scores-qk"],
                        help="fused attention-block Pallas kernel policy "
                             "(int8-scores = s8 score+PV dots, opt-in "
                             "accuracy class)")
    parser.add_argument("--no-attn-maps", action="store_true",
                        help="pure classification (not the headline config)")
    parser.add_argument("--no-wait-backend", action="store_true",
                        help="skip the subprocess tunnel-health probe")
    args = parser.parse_args()

    if not args.no_wait_backend:
        _wait_for_backend()

    import jax

    # persistent compilation cache: repeated bench runs skip the 10-30s
    # compile (and a flaky-tunnel compile stall can't eat the whole run)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    from interactive_vit_tpu.models import vit

    want_attn = not args.no_attn_maps
    batches = [args.batch] if args.batch else [32, 64, 96, 128]
    res = measure(args.variant, args.dtype, batches, args.iters,
                  want_attn=want_attn, attn=args.attn, block=args.block)
    cfg = vit.VARIANTS[args.variant]
    if res["mfu"] is not None:
        print(f"  ~{res['gflops_per_img']:.1f} GFLOPs/img analytic -> "
              f"MFU {res['mfu']:.1%} of v5e bf16 peak", file=sys.stderr)

    target = 2000.0
    best = res["imgs_per_s"]
    print(json.dumps({
        "metric": f"{args.variant} @{cfg.img_size} inference w/ "
                  f"{'full attention-map extraction' if want_attn else 'no taps'}"
                  f" ({args.dtype}, attn={args.attn})",
        "value": best,
        "unit": "imgs/sec/chip",
        "vs_baseline": round(best / target, 4),
        **({"mfu_v5e_bf16": res["mfu"]}
           if (res["mfu"] is not None and args.dtype == "bfloat16")
           else {}),
    }))


if __name__ == "__main__":
    main()

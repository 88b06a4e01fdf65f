"""Round-3: train-step A/B of the custom-VJP flash attention kernel.

r3_train_profile isolated the no-remat train step's bottleneck: XLA's
attention autodiff runs at 11-13 TF/s (f32 [B,H,N,N] probs written +
re-read through HBM) while the dense matmuls in the same program run at
171-180 TF/s. ``ops/attention_vjp`` removes every [N,N] HBM round-trip
(flash forward + softmax-recompute backward). This script measures the
end-to-end step-time delta on the real chip and grabs a device-event
trace of the kernel config for docs/kernels.md.

Emits JSONL to /tmp/r3_train_vjp.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_train_vjp.jsonl")

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
from interactive_vit_tpu.parallel.train import (  # noqa: E402
    make_optimizer, make_train_step,
)
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402


def run_case(variant: str, batch: int, impl, label: str,
             remat: bool = False, profile: bool = False,
             head_major: bool = False):
    cfg = vit.VARIANTS[variant]
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    if head_major:  # the packed-kernel layout (zero-transpose path)
        from interactive_vit_tpu.parallel.mesh import (
            permute_qkv_head_major,
        )

        params = permute_qkv_head_major(params, cfg.heads)
    opt = make_optimizer(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, attn_impl=impl, remat=remat,
                                   qkv_head_major=head_major),
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
    flops_mult = 4.0 if remat else 3.0
    mfu = batch * gf * 1e9 * flops_mult / wall / PEAK
    out = dict(stage="train", variant=variant, batch=batch, impl=label,
               remat=remat, step_ms=round(wall * 1e3, 1),
               imgs_s=round(batch / wall, 1), loss2=round(loss0, 4),
               mfu=round(mfu, 4), compile_s=round(compile_s, 1))

    if profile:
        tdir = f"/tmp/r3_tvjp_{variant}_{batch}_{label}"
        jax.profiler.start_trace(tdir)
        for _ in range(3):
            p, s, loss = step(p, s, images, labels)
        jax.device_get(loss)
        jax.profiler.stop_trace()
        rep = report(tdir, top=12)
        out["device_ms_per_step"] = round(rep["total_device_us"] / 3e3, 2)
        out["by_category_ms"] = {
            k: round(v / 3e3, 2) for k, v in rep["by_category_us"].items()}
        out["top_ops"] = [
            (o["name"], round(o["us"] / 3e3, 2)) for o in rep["top_ops_us"]]
    emit(**out)
    del p, s, params, opt_state
    return out


CASES = (
    # (variant, batch, remat): the r3_train_profile remat-off configs;
    # ViT-L@384 keeps remat ON (auto_remat: its no-remat activations
    # breach HBM at any useful batch) — there the kernel's win is the
    # backward's probs traffic only
    ("vit_s16", 128, False),
    ("vit_b16", 128, False),
    ("vit_l16", 32, True),
)

import os  # noqa: E402

ONLY = os.environ.get("IVT_ONLY", "")  # comma-sep label filter for reruns

for variant, batch, remat in CASES:
    for impl, label, hm in ((None, "reference", False),
                            (trainable_flash_mhsa, "flash_vjp", False),
                            (trainable_flash_mhsa, "flash_packed", True)):
        if ONLY and label not in ONLY.split(","):
            continue
        try:
            run_case(variant, batch, impl, label, remat=remat,
                     head_major=hm,
                     profile=(label == "flash_packed"
                              and variant == "vit_b16"))
        except Exception as err:  # noqa: BLE001 — record, keep sweeping
            emit(stage="error", variant=variant, batch=batch, impl=label,
                 err=str(err)[:500])

emit(stage="done")

"""Round-3: WHERE does the training step spend its device time?

The first train bench (r3_train_bench.py) read vit_s16 27% / vit_b16 39%
MFU (counting remat's 4x-forward FLOPs) against inference's ~76% — this
script gathers the device-event evidence to aim the fix:

  1. remat ON vs OFF: per-block ``jax.checkpoint`` re-runs every block
     forward in the backward (+1 forward = 4x vs 3x fwd FLOPs). A single
     v5e has 16 GB HBM — ViT-S/B activations at these batches likely fit
     without remat, making the extra forward pure waste.
  2. category breakdown (trace_agg): is the backward dominated by the
     attention's [B,H,N,N] HBM traffic (flash-bwd kernel candidate), by
     data formatting, or by non-MXU fusions?

Emits JSONL to /tmp/r3_train_profile.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_train_profile.jsonl")

import jax  # noqa: E402

setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from bench import (  # noqa: E402
    V5E_BF16_PEAK_FLOPS as PEAK, _forward_gflops as forward_gflops,
)
from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.parallel.train import (  # noqa: E402
    make_optimizer, make_train_step,
)
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402


def run_case(variant: str, batch: int, remat: bool, profile: bool = True):
    cfg = vit.VARIANTS[variant]
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    opt = make_optimizer(3e-4)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(cfg, opt, remat=remat),
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
    jax.device_get(loss)
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
    out = dict(stage="train", variant=variant, batch=batch, remat=remat,
               step_ms=round(wall * 1e3, 1),
               imgs_s=round(batch / wall, 1),
               mfu=round(mfu, 4), compile_s=round(compile_s, 1))

    if profile:
        tdir = f"/tmp/r3_tprof_{variant}_{batch}_{int(remat)}"
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


for variant, batch in (("vit_s16", 128), ("vit_b16", 128)):
    for remat in (True, False):
        try:
            run_case(variant, batch, remat)
        except Exception as err:  # noqa: BLE001 — record, keep sweeping
            emit(stage="error", variant=variant, batch=batch, remat=remat,
                 err=str(err)[:500])

emit(stage="done")

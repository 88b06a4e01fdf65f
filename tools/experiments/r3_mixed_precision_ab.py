"""Round-3: what does --dtype mixed cost vs pure bf16? On-chip A/B.

Three arms of the same vit_b16 @224 batch-128 training config (flash
custom-VJP attention, remat off): pure bf16 (params+compute bf16, bf16
AdamW moments), mixed (f32 masters + bf16 compute, f32 moments), f32
(the parity config, for scale). Steady-state ms/step over 30 timed
steps after 5 warmup. Also vit_l16@384 @32 accum4 — the L-scale recipe —
to see the master-copy HBM cost at size. JSONL to /tmp/r3_mixed_ab.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_mixed_ab.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.parallel import mesh as mesh_lib  # noqa: E402
from interactive_vit_tpu.parallel import train as train_lib  # noqa: E402

mesh = mesh_lib.make_mesh(None)


def run_case(variant, batch, accum, arm, steps=30, warmup=5):
    cfg = vit.resolve_variant(variant)
    dtype = jnp.bfloat16 if arm == "bf16" else None
    compute = jnp.bfloat16 if arm == "mixed" else None
    from interactive_vit_tpu.ops.dispatch import default_train_attn_impl

    attn = default_train_attn_impl(
        "auto", n_devices=1, dtype=compute or dtype or jnp.float32,
        cfg=cfg)
    remat = train_lib.auto_remat(
        cfg, batch // accum, dtype=compute or dtype or jnp.float32,
        flash_attn=attn is not None)
    with mesh:
        params, opt_state, step_fn, _ = train_lib.setup_sharded(
            cfg, mesh, seed=0, lr=3e-4, dtype=dtype, compute_dtype=compute,
            attn_impl=attn, remat=remat, accum_steps=accum)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(size=(batch, 3, cfg.img_size,
                                               cfg.img_size)),
                             jnp.float32)
        labels = jnp.asarray(rng.integers(0, 1000, size=(batch,)))
        for _ in range(warmup):
            params, opt_state, loss = step_fn(params, opt_state,
                                              images, labels)
        jax.block_until_ready(loss)
        walls = []
        for _ in range(steps):
            t0 = time.time()
            params, opt_state, loss = step_fn(params, opt_state,
                                              images, labels)
            jax.block_until_ready(loss)
            walls.append(time.time() - t0)
        ms = float(np.median(walls)) * 1e3
        emit(stage="case", variant=variant, batch=batch, accum=accum,
             arm=arm, remat=bool(remat), flash=attn is not None,
             step_ms_p50=round(ms, 1),
             imgs_per_s=round(batch / (ms / 1e3), 1),
             loss=round(float(loss), 4))
        del params, opt_state
        return ms


for arm in ("bf16", "mixed", "f32"):
    run_case("vit_b16", 128, 1, arm)

for arm in ("bf16", "mixed"):
    run_case("vit_l16@384", 32, 4, arm, steps=10, warmup=3)

emit(stage="done")
print("r3_mixed_precision_ab complete")

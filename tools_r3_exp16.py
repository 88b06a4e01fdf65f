import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl
from interactive_vit_tpu.ops.layouts import row_major_out_shardings

cfg = vit.VARIANTS["vit_l16"]
params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                        d=cfg.width, heads=cfg.heads)

def run(batch, want_attn, iters=10):
    images = jnp.asarray(np.random.default_rng(0).random(
        (batch, 3, 384, 384), dtype=np.float32), jnp.bfloat16)
    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=want_attn,
                          block_impl=bi)
        return ((out["logits"], out["attn"], out["rollout"]) if want_attn
                else out["logits"])
    try:
        sh = row_major_out_shardings(fn, params, images)
        jitted = jax.jit(fn, out_shardings=sh) if sh is not None else jax.jit(fn)
        jax.block_until_ready(jitted(params, images))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"batch": batch, "maps": want_attn, "ok": True,
                          "ips": round(batch / dt, 1),
                          "ms": round(dt * 1e3, 2)}), flush=True)
    except Exception as e:
        print(json.dumps({"batch": batch, "maps": want_attn, "ok": False,
                          "err": repr(e)[:150]}), flush=True)

run(16, False)
run(32, False)
run(32, True)

import json, time, traceback
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl

B = 4
def try_depth(depth, salt, full_err=False):
    cfg = vit.ViTConfig(f"ld{depth}s{salt}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(salt), cfg, dtype=jnp.bfloat16)
    bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                            d=cfg.width, heads=cfg.heads)
    images = jnp.asarray(np.random.default_rng(0).random(
        (B, 3, 384, 384), dtype=np.float32), jnp.bfloat16)
    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True, block_impl=bi)
        return out["logits"], out["attn"], out["rollout"]
    try:
        t0 = time.perf_counter()
        out = jax.jit(fn)(params, images)
        jax.block_until_ready(out)
        print(json.dumps({"depth": depth, "salt": salt, "ok": True,
                          "compile_s": round(time.perf_counter()-t0, 1)}), flush=True)
        return True
    except Exception as e:
        msg = str(e) if full_err else repr(e)[:100]
        print(json.dumps({"depth": depth, "salt": salt, "ok": False,
                          "err": msg}), flush=True)
        return False

r = [try_depth(3, s, full_err=(s == 0)) for s in range(3)]
print(json.dumps({"depth3_attempts": r}), flush=True)

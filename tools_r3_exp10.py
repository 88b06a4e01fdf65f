import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl

B = 4
def try_depth(depth):
    cfg = vit.ViTConfig(f"lx{depth}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
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
        print(json.dumps({"depth": depth, "ok": True,
                          "compile_s": round(time.perf_counter()-t0, 1)}), flush=True)
        return True
    except Exception as e:
        print(json.dumps({"depth": depth, "ok": False, "err": repr(e)[:120]}), flush=True)
        return False

for dpt in (2, 3, 4, 6):
    if not try_depth(dpt):
        break

import json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl

cfg = vit.VARIANTS["vit_l16"]
params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                        d=cfg.width, heads=cfg.heads)
images = jnp.asarray(np.random.default_rng(0).random(
    (4, 3, 384, 384), dtype=np.float32), jnp.bfloat16)
def fn(params, images):
    out = vit.forward(params, images, cfg, want_attn=True, block_impl=bi)
    return out["logits"], out["attn"], out["rollout"]
try:
    out = jax.jit(fn)(params, images)
    jax.block_until_ready(out)
    print("OK")
except Exception as e:
    s = str(e)
    i = s.find("ERROR")
    print(s[i:i+1200] if i >= 0 else s[:1200])

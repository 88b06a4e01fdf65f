import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl
from interactive_vit_tpu.ops import attention as A

B = 4
def scan_rollout(means):
    ms = jnp.stack([m.astype(jnp.float32) for m in means])  # [L,B,N,N]
    b, n = ms.shape[1], ms.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (b, n, n))
    def body(r, m):
        aug = 0.5 * m + 0.5 * jnp.eye(n, dtype=jnp.float32)
        aug = aug / jnp.sum(aug, axis=-1, keepdims=True)
        return jnp.einsum("bij,bjk->bik", aug, r), None
    r, _ = jax.lax.scan(body, ident, ms)
    return r

def bf16_rollout(means):
    b, n = means[0].shape[0], means[0].shape[-1]
    r = jnp.broadcast_to(jnp.eye(n, dtype=jnp.bfloat16), (b, n, n))
    for m in means:
        aug = (0.5 * m.astype(jnp.float32)
               + 0.5 * jnp.eye(n, dtype=jnp.float32))
        aug = (aug / jnp.sum(aug, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        r = jnp.einsum("bij,bjk->bik", aug, r,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return r

def try_depth(depth, impl, tag):
    cfg = vit.ViTConfig(f"lc{depth}{tag}", 384, 16, 1024, depth, 16)
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                            d=cfg.width, heads=cfg.heads)
    images = jnp.asarray(np.random.default_rng(0).random(
        (B, 3, 384, 384), dtype=np.float32), jnp.bfloat16)
    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True, block_impl=bi)
        return out["logits"], out["attn"], out["rollout"]
    orig = A.attention_rollout
    A.attention_rollout = impl
    try:
        t0 = time.perf_counter()
        out = jax.jit(fn)(params, images)
        jax.block_until_ready(out)
        print(json.dumps({"depth": depth, "tag": tag, "ok": True,
                          "compile_s": round(time.perf_counter()-t0, 1)}), flush=True)
        return True
    except Exception as e:
        print(json.dumps({"depth": depth, "tag": tag, "ok": False,
                          "err": repr(e)[:100]}), flush=True)
        return False
    finally:
        A.attention_rollout = orig

if try_depth(3, lambda ms: scan_rollout(list(ms)), "scan"):
    try_depth(24, lambda ms: scan_rollout(list(ms)), "scan")
if try_depth(3, lambda ms: bf16_rollout(list(ms)), "bf16"):
    try_depth(24, lambda ms: bf16_rollout(list(ms)), "bf16")

"""Verify the scoped-vmem fix: depth-3 in-model, then full ViT-L maps-on."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops.dispatch import default_block_impl
from interactive_vit_tpu.ops.layouts import row_major_out_shardings

def run(variant_cfg, batch, iters=10, pin=True, tag=""):
    cfg = variant_cfg
    params = vit.init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    bi = default_block_impl("auto", dtype=jnp.bfloat16, n=cfg.tokens,
                            d=cfg.width, heads=cfg.heads)
    images = jnp.asarray(np.random.default_rng(0).random(
        (batch, 3, cfg.img_size, cfg.img_size), dtype=np.float32),
        jnp.bfloat16)
    def fn(params, images):
        out = vit.forward(params, images, cfg, want_attn=True, block_impl=bi)
        return out["logits"], out["attn"], out["rollout"]
    try:
        if pin:
            sh = row_major_out_shardings(fn, params, images)
            jitted = jax.jit(fn, out_shardings=sh) if sh is not None else jax.jit(fn)
        else:
            jitted = jax.jit(fn)
        t0 = time.perf_counter()
        out = jitted(params, images)
        jax.block_until_ready(out)
        cs = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(params, images)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"tag": tag, "name": cfg.name, "batch": batch,
                          "ok": True, "compile_s": round(cs, 1),
                          "ips": round(batch / dt, 1),
                          "ms": round(dt * 1e3, 2)}), flush=True)
        return True
    except Exception as e:
        print(json.dumps({"tag": tag, "name": cfg.name, "batch": batch,
                          "ok": False, "err": repr(e)[:150]}), flush=True)
        return False

ok = run(vit.ViTConfig("lv3", 384, 16, 1024, 3, 16), 4, tag="d3")
if ok:
    full = vit.VARIANTS["vit_l16"]
    run(full, 4, tag="full")
    run(full, 8, tag="full")
    run(full, 16, tag="full")

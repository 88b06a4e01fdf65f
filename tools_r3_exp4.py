"""ViT-L maps-on compile-failure bisect (single TPU process).

The headwise kernel maps-on at ViT-L/16@384 shapes reproducibly kills the
remote compile helper (HTTP 500, subprocess exit 1). Last session's 301
imgs/s was measured BEFORE the head-group widening landed in the snapshot
commit; suspect: hb=4 maps-on (estimated 16.71 MiB) vs the ~16 MiB scoped
VMEM reality. Isolate the kernel and bisect hb.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

OUT = open("/tmp/r3_exp4.jsonl", "a", buffering=1)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    OUT.write(json.dumps(kw) + "\n")


jax.config.update("jax_compilation_cache_dir", "/tmp/ivt_jit_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_block as fb

emit(stage="start")

cfg = vit.VARIANTS["vit_l16"]
d, heads, n = cfg.width, cfg.heads, cfg.tokens  # 1024, 16, 577
params = vit.init_params(jax.random.key(0),
                         vit.ViTConfig("l1", 384, 16, d, 1, heads),
                         dtype=jnp.bfloat16)
p = params["blocks"][0]
x = jnp.asarray(np.random.default_rng(0).standard_normal((8, n, d)),
                jnp.bfloat16)

orig_head_group = fb._head_group


def try_case(tag, hb_force=None, fast=True, want_attn=True, want_mean=True):
    if hb_force is not None:
        fb._head_group = lambda *a, **k: hb_force
    else:
        fb._head_group = orig_head_group
    try:
        t0 = time.perf_counter()
        y = fb.headwise_attn_block(x, p, heads, want_attn=want_attn,
                                   want_mean=want_mean, fast_softmax=fast)
        jax.block_until_ready(y[0])
        emit(stage="case", tag=tag, ok=True,
             compile_s=round(time.perf_counter() - t0, 1))
        return True
    except Exception as e:  # noqa: BLE001
        emit(stage="case", tag=tag, ok=False, err=repr(e)[:200])
        return False
    finally:
        fb._head_group = orig_head_group


# what does auto pick?
hb_auto = orig_head_group(d // heads, heads, n=n, d=d, esize=2,
                          emit=True, emit_mean=True)
emit(stage="hb_auto", hb=hb_auto)

try_case("auto_maps_on")             # expected to fail (hb=4?)
try_case("hb2_maps_on", hb_force=2)  # last session's pre-widening config
try_case("hb4_maps_off", hb_force=None, want_attn=False)  # sanity
try_case("auto_slow_softmax", fast=False)

emit(stage="done")

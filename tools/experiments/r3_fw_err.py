"""Focused repro: full compile-error text for the fused window kernel at
swin_t stage 0 (res 56, nw 8, C 96) — the truncated HTTP-500 hides the
real Mosaic/vmem detail ~1.5KB in (CLAUDE.md scoped-vmem notes)."""

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_fw_err.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import swin  # noqa: E402
from interactive_vit_tpu.ops import fused_window as fw  # noqa: E402

cfg = swin.VARIANTS["swin_t"]
dtype = jnp.bfloat16
params = swin.init_params(jax.random.key(0), cfg, dtype=dtype)
rng = np.random.default_rng(0)

for s, shift in ((0, 0), (1, 0)):
    res, c = cfg.stage_res(s), cfg.stage_dim(s)
    p = params["stages"][s][0]
    x = jnp.asarray(rng.standard_normal((4, res, res, c)), dtype)
    try:
        got = jax.jit(lambda p, x, _s=s, _sh=shift: swin.block(
            p, x, cfg, _s, _sh, want_attn=True,
            window_impl=fw.fused_window_attn))(p, x)
        jax.block_until_ready(got)
        print(f"stage {s} OK")
    except Exception as e:
        txt = str(e)
        print(f"==== stage {s} FULL ERROR ({len(txt)} chars) ====")
        print(txt)
        break

"""Round-4: swin W8A8 device-event truth (wall clocks lie, trap #10)."""
import functools
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r4_swin_w8a8_trace.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import swin  # noqa: E402
from interactive_vit_tpu.ops import fused_window as fw  # noqa: E402
from interactive_vit_tpu.ops.dispatch import default_mlp_impl  # noqa: E402
from interactive_vit_tpu.ops.layouts import row_major_out_shardings  # noqa: E402
from interactive_vit_tpu.ops.quant import quantize_tree  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

cfg = swin.VARIANTS["swin_t"]
dtype = jnp.bfloat16
params = swin.init_params(jax.random.key(0), cfg, dtype=dtype)
qparams = quantize_tree(params, names=frozenset({"fc1_w", "fc2_w"}),
                        mode="w8a8")
mlp_impls = [default_mlp_impl("w8a8", dtype=dtype, d=cfg.stage_dim(s),
                              mlp_dim=cfg.stage_dim(s) * cfg.mlp_ratio)
             for s in range(len(cfg.depths))]
batch = 128
images = jnp.asarray(np.random.default_rng(0).random(
    (batch, 3, 224, 224), dtype=np.float32), dtype)

for name, p, impls in (("bf16", params, None),
                       ("w8a8_kernel", qparams, mlp_impls),
                       ("w8a8_xla", qparams, None)):
    def fn(pp, x, _impls=impls):
        return swin.forward(pp, x, cfg, window_impl=fw.fused_window_attn,
                            mlp_impls=_impls)["logits"]

    sh = row_major_out_shardings(fn, p, images)
    jitted = jax.jit(fn, out_shardings=sh) if sh is not None else jax.jit(fn)
    jax.block_until_ready(jitted(p, images))  # warm outside the trace
    tdir = f"/tmp/r4_traces/swin_w8a8_{name}"
    jax.profiler.start_trace(tdir)
    for _ in range(5):
        out = jitted(p, images)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    rep = report(tdir, top=6)
    emit(stage="trace", mode=name, report=rep)
emit(stage="done")

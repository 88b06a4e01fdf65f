"""Round-2 continuation, experiment batch 1 (single TPU process).

Runs, in one process (the TPU is exclusive-access through a flaky tunnel —
CLAUDE.md trap #1: batch long TPU experiments into ONE script):

  1. int8 vs bf16 matmul rate check (profiler device events)
  2. ViT-B/16 naive-XLA W8A8 throughput (batch 32/64, maps on) — the
     control that measured the quantize-chain loss (docs/kernels.md)
  3. ViT-L/16@384 maps-on / maps-off sweeps (batch 8/16/32)
  4. profiler trace of the best ViT-L maps-off config

Writes JSON lines to /tmp/r3_exp1.jsonl and traces under /tmp/r3_traces/.
Shared loop: tools/experiments/_harness.py.
"""

import numpy as np

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_exp1.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))


# ---- 1. int8 vs bf16 matmul rate ------------------------------------------

def mm_rate_check():
    n = 4096
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    abf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bbf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def dot8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    @jax.jit
    def dotbf(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    # warmup/compile
    jax.block_until_ready([dot8(a8, b8), dotbf(abf, bbf)])
    tdir = "/tmp/r3_traces/mm_rate"
    jax.profiler.start_trace(tdir)
    for _ in range(20):
        o1 = dot8(a8, b8)
    jax.block_until_ready(o1)
    for _ in range(20):
        o2 = dotbf(abf, bbf)
    jax.block_until_ready(o2)
    jax.profiler.stop_trace()
    emit(stage="mm_rate", report=report(tdir, top=10))


mm_rate_check()

# naive-XLA W8A8 ViT-B (maps on, same contract as headline; plus maps-off)
model_sweep(emit, "vit_b16", "w8a8naive", True, [32, 64],
            quant="naive_w8a8", trace_batch=32)
model_sweep(emit, "vit_b16", "w8a8naive", False, [32, 64],
            quant="naive_w8a8")

# ViT-L/16@384 current state, maps off then on
model_sweep(emit, "vit_l16", "bf16", False, [8, 16, 32], trace_batch=16)
model_sweep(emit, "vit_l16", "bf16", True, [8, 16])

# ViT-L naive W8A8 (the MLP is an even bigger share at D=1024)
model_sweep(emit, "vit_l16", "w8a8naive", False, [8, 16, 32],
            quant="naive_w8a8")

emit(stage="done")

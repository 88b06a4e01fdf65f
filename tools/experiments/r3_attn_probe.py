"""Round-3: dh=64 attention-dot MXU probes (VERDICT r2 #2 evidence).

The fused-block budget says the per-head [N,dh=64] score/PV dots cap at
half MXU width and the kernel sits ~10% from its structural floor. This
script gathers profiler device-event evidence for the candidate
restructurings WITHOUT committing to one:

  1. dot rate ladder: [197,64]x[64,197] vs [197,128]x[128,197] vs
     batched 2-head dot_general — does packing the batch dim recover
     the K=64 width loss at all on v5e?
  2. int8 score dot: s8[197,64] x s8[64,197] vs bf16 — is the 2x int8
     MXU rate available at attention-score shapes (not just 2048^3)?
  3. end-to-end check: ViT-B batch-96 headline with the current kernel
     (fresh measurement for the round-3 record) + profiler trace.

Emits JSONL to /tmp/r3_attn.jsonl; traces under /tmp/r3_traces/.
"""

import time

import numpy as np

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_attn.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))


def timed_trace(tag, fns_args, iters=200):
    """Profile each name -> (fn, args) in its OWN trace dir (trace_agg
    aggregates by hlo_category, so mixing shapes in one trace loses the
    per-shape attribution — learned from the first run of this probe)."""
    for name, (fn, args) in fns_args.items():
        j = jax.jit(fn)
        jax.block_until_ready(j(*args))
        tdir = f"/tmp/r3_traces/{tag}__{name}"
        jax.profiler.start_trace(tdir)
        for _ in range(iters):
            o = j(*args)
        jax.block_until_ready(o)
        jax.profiler.stop_trace()
        r = report(tdir, top=6)
        emit(stage=tag, case=name, iters=iters,
             us_per_iter=round(r.get("total_device_us", 0) / iters, 3),
             report=r)


# ---- 1. score-dot shape ladder --------------------------------------------
n, dh = 197, 64
rng = np.random.default_rng(0)
q64 = jnp.asarray(rng.standard_normal((n, dh)), jnp.bfloat16)
k64 = jnp.asarray(rng.standard_normal((n, dh)), jnp.bfloat16)
q128 = jnp.asarray(rng.standard_normal((n, 128)), jnp.bfloat16)
k128 = jnp.asarray(rng.standard_normal((n, 128)), jnp.bfloat16)
q2 = jnp.asarray(rng.standard_normal((2, n, dh)), jnp.bfloat16)
k2 = jnp.asarray(rng.standard_normal((2, n, dh)), jnp.bfloat16)
# big-batch variants: amortize dispatch, what the kernel actually sees
qb = jnp.asarray(rng.standard_normal((24, n, dh)), jnp.bfloat16)
kb = jnp.asarray(rng.standard_normal((24, n, dh)), jnp.bfloat16)


def d64(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def d128(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def dbatched(q, k):
    return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


timed_trace("score_ladder", {
    "dot_197x64": (d64, (q64, k64)),
    "dot_197x128": (d128, (q128, k128)),
    "dot_batched2_197x64": (dbatched, (q2, k2)),
    "dot_batched24_197x64": (dbatched, (qb, kb)),
})

# ---- 2. int8 score dot ----------------------------------------------------
q8 = jnp.asarray(rng.integers(-127, 128, (n, dh)), jnp.int8)
k8 = jnp.asarray(rng.integers(-127, 128, (n, dh)), jnp.int8)
q8b = jnp.asarray(rng.integers(-127, 128, (24, n, dh)), jnp.int8)
k8b = jnp.asarray(rng.integers(-127, 128, (24, n, dh)), jnp.int8)


def d8(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)


def d8b(q, k):
    return jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.int32)


timed_trace("int8_scores", {
    "s8_197x64": (d8, (q8, k8)),
    "s8_batched24_197x64": (d8b, (q8b, k8b)),
    "bf16_197x64": (d64, (q64, k64)),
    "bf16_batched24_197x64": (dbatched, (qb, kb)),
})

# ---- 3. headline refresh + trace ------------------------------------------
model_sweep(emit, "vit_b16", "r3_headline", True, (96,), iters=10,
            trace_batch=96, trace_root="/tmp/r3_traces")

emit(stage="done")

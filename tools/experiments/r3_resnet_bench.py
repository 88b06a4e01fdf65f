"""Round-3: ResNet-50 throughput on the v5e (the conv-family datapoint).

Every conv lowers through XLA onto the MXU; this records imgs/s at
224 px bf16 across batches, plus one profiler trace for the MXU-share
sanity check. Emits JSONL to /tmp/r3_resnet.jsonl.
"""

import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_resnet.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import resnet  # noqa: E402
from interactive_vit_tpu.tools.trace_agg import report  # noqa: E402

emit(stage="start", devices=str(jax.devices()))

dtype = jnp.bfloat16
params = resnet.init_params(jax.random.key(0), dtype=dtype)


@jax.jit
def fn(params, images):
    return resnet.forward(params, images)


for batch in (32, 64, 128, 256):
    try:
        images = jnp.asarray(
            np.random.default_rng(0).random((batch, 3, 224, 224),
                                            dtype=np.float32), dtype)
        jax.block_until_ready(fn(params, images))
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, images)
        jax.device_get(out[:1])  # force completion (CLAUDE.md trap #8)
        dt = time.perf_counter() - t0
        emit(stage="sweep", batch=batch, ips=round(batch * iters / dt, 1),
             ms_per_batch=round(dt / iters * 1e3, 2))
        if batch == 128:
            tdir = "/tmp/r3_traces/resnet50_b128"
            jax.profiler.start_trace(tdir)
            for _ in range(3):
                out = fn(params, images)
            jax.device_get(out[:1])
            jax.profiler.stop_trace()
            emit(stage="trace", batch=batch, report=report(tdir, top=10))
    except Exception as e:  # noqa: BLE001
        emit(stage="error", batch=batch, err=repr(e)[:400])

emit(stage="done")

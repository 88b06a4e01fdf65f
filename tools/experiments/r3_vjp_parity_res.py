"""Round-3: (a) post-refactor flash-VJP grad parity on the real chip,
(b) resolution-flexible serving (dino_s16@448) on the real chip.

(a) re-pins the on-chip bf16 grad-parity contract after attention_vjp's
backward math was deduped into _head_grads (same math, one copy) — the
interpret-mode tests can't see Mosaic lowering differences.
(b) drives the @res feature through the executor on TPU: the 28x28
dense-feature grid (785 tokens, the dino_s8 class) with a bicubically
resampled position table.

Emits JSONL to /tmp/r3_vjp_parity.jsonl. Single process (CLAUDE.md #1).
"""

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_vjp_parity.jsonl")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.ops import attention_vjp as av  # noqa: E402
from interactive_vit_tpu.ops.attention import (  # noqa: E402
    attention_reference,
)


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def grad_parity(b, h, n, dh, dtype=jnp.bfloat16):
    """max rel err of d{q,k,v} flash-VJP vs XLA autodiff on-chip."""
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v = (jax.random.normal(ks[i], (b, h, n, dh), dtype)
               for i in range(3))
    do_seed = jax.random.normal(ks[3], (b, h, n, dh), dtype)

    def loss_kernel(q, k, v):
        return jnp.sum(av.attention_train(q, k, v) * do_seed)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v)[0] * do_seed)

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    return max(rel(a, b) for a, b in zip(jax.device_get(gk),
                                         jax.device_get(gr)))


def packed_parity(b, h, n, dh, dtype=jnp.bfloat16):
    """Packed head-major kernel vs XLA autodiff (same seed contract)."""
    d = h * dh
    ks = jax.random.split(jax.random.key(1), 2)
    s = jax.random.normal(ks[0], (b, n, 3 * d), dtype)  # head-major qkv
    do_seed = jax.random.normal(ks[1], (b, n, d), dtype)

    def loss_packed(s):
        return jnp.sum(av.attention_train_packed(s) * do_seed)

    def loss_ref(s):
        qkv = s.reshape(b, n, h, 3, dh)
        q, k, v = (qkv[:, :, :, i].transpose(0, 2, 1, 3) for i in range(3))
        o = attention_reference(q, k, v)[0]
        o = o.transpose(0, 2, 1, 3).reshape(b, n, d)
        return jnp.sum(o * do_seed)

    gp = jax.jit(jax.grad(loss_packed))(s)
    gr = jax.jit(jax.grad(loss_ref))(s)
    return rel(jax.device_get(gp), jax.device_get(gr))


for (b, h, n, dh) in [(2, 6, 197, 64), (2, 16, 577, 64)]:
    try:
        e = grad_parity(b, h, n, dh)
        emit(stage="vjp_parity", shape=[b, h, n, dh], rel_err=e,
             ok=e <= 1e-2)
    except Exception as ex:  # noqa: BLE001
        emit(stage="vjp_parity", shape=[b, h, n, dh], error=repr(ex)[:500])

for (b, h, n, dh) in [(2, 6, 197, 64)]:
    try:
        e = packed_parity(b, h, n, dh)
        emit(stage="packed_parity", shape=[b, h, n, dh], rel_err=e,
             ok=e <= 1e-2)
    except Exception as ex:  # noqa: BLE001
        emit(stage="packed_parity", shape=[b, h, n, dh],
             error=repr(ex)[:500])

# ---- (b) dino_s16@448 through the executor on TPU ----------------------
import time  # noqa: E402

from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.autoregister import make_model  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.wire.schema import graph_from_json  # noqa: E402

try:
    from interactive_vit_tpu.models import vit

    reg = Registry()
    register_builtin(reg)
    # params at the NATIVE resolution so adapt_pos_embed (14x14 -> 28x28
    # bicubic resample) actually runs on this backend
    native = vit.init_params(jax.random.key(0), vit.VARIANTS["dino_s16"],
                             dtype=jnp.bfloat16)
    model = make_model("dino_s16@448", params=native, dtype=jnp.bfloat16)
    model.register(reg)
    g = graph_from_json(model.generate_graph_json())
    img = np.random.default_rng(0).random((1, 3, 512, 512), np.float32)
    for n in g.nodes:
        if not n.inputs and n.name.endswith(":transform"):
            g.add_input(jnp.asarray(img), n, "o")
    ex = Executor(reg)
    t0 = time.perf_counter()
    outs = ex.run(g, taps="all")
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = ex.run(g, taps="all")
    warm = time.perf_counter() - t0
    shapes = sorted({tuple(v.shape) for d in outs.values()
                     for v in d.values()})
    tok = 28 * 28 + 1
    emit(stage="res448", cold_s=round(cold, 2), warm_s=round(warm, 3),
         n_tokens=tok, has_grid=any(s[-2:] == (tok, 384) for s in shapes),
         finite=all(np.isfinite(np.asarray(v)).all()
                    for d in outs.values() for v in d.values()))
except Exception as ex:  # noqa: BLE001
    emit(stage="res448", error=repr(ex)[:800])

emit(stage="done")

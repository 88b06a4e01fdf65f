"""On-chip kernel + grad-twin parity gate (VERDICT r3 #1b).

CPU CI provably cannot catch two failure classes (CLAUDE.md
conventions): (a) a Pallas kernel that diverges from its jnp reference
only when COMPILED for the real TPU (interpret mode is a simulator), and
(b) a missing/wrong differentiable grad twin (dispatch turns kernels off
on CPU, so the twin never engages — the round-3 saliency trace-time
failure class). This gate runs EVERY Pallas kernel against its jnp
reference and every kernel-backed family's saliency grad replay against
its XLA twin, ON THE CHIP, and writes ``KERNELS_r{N}.json`` at the repo
root for the round-close checklist.

Run (serialized with all other TPU use, default backend):

    python tools/experiments/kernel_gate.py [--round 4]

Thresholds: f32 kernels ≤1e-4 abs (the repo's parity contract,
BASELINE.json north star); bf16 compares both paths in bf16, ≤2e-2 rel
of the output scale; quantized paths compare against the SAME
quantization semantics so the bound stays tight.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RESULTS = {"checks": [], "platform": None}


def record(name, err, bound, extra=None):
    ok = bool(err <= bound)
    RESULTS["checks"].append(
        {"name": name, "max_err": float(err), "bound": bound,
         "ok": ok, **(extra or {})})
    print(f"{'PASS' if ok else 'FAIL'} {name}: {err:.3e} "
          f"(bound {bound:.0e})", flush=True)


def record_nonzero(name, err):
    """A comparison that must show NONZERO drift: asserts the two
    instances being compared actually took different code paths. An
    exactly-0.0 'kernel vs reference' row means the gate silently
    compared a path to itself — a tautology, not a check (the r4 int8
    grad-twin rows; VERDICT r4 weak #3)."""
    ok = bool(err > 0.0)
    RESULTS["checks"].append(
        {"name": name, "max_err": float(err), "bound": 0.0,
         "mode": "must_exceed", "ok": ok})
    print(f"{'PASS' if ok else 'FAIL'} {name}: {err:.3e} "
          f"(must be > 0: paths must actually diverge)", flush=True)


def rel_err(got, ref):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    scale = max(float(np.max(np.abs(ref))), 1e-6)
    return float(np.max(np.abs(got - ref))) / scale


def check_fused_block():
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops import fused_block as fb

    cfg = vit.VARIANTS["vit_b16"]
    params = vit.init_params(jax.random.key(0), cfg)
    p = params["blocks"][0]
    rng = np.random.default_rng(0)
    for dtype, bound in (("float32", 1e-4), ("bfloat16", 2e-2)):
        x = jnp.asarray(rng.standard_normal(
            (2, cfg.tokens, cfg.width)).astype(np.float32) * 0.5,
            dtype=dtype)
        pd = jax.tree.map(lambda a: jnp.asarray(a, dtype), p)
        ref = jax.jit(lambda pp, xx: vit.block(
            pp, xx, cfg, want_attn=True))(pd, x)
        got = jax.jit(lambda pp, xx: vit.block(
            pp, xx, cfg, want_attn=True,
            block_impl=fb.fused_attn_block))(pd, x)
        record(f"fused_attn_block/{dtype}/out",
               rel_err(got[0], ref[0]), bound)
        record(f"fused_attn_block/{dtype}/probs",
               rel_err(got[1], ref[1]), bound)

    # head-mean emission + ToMe key bias (bf16, the served config)
    from interactive_vit_tpu.ops import attention as attn_ops
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.tokens, cfg.width)).astype(np.float32) * 0.5,
        dtype="bfloat16")
    pd = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"), p)
    kb = jnp.asarray(rng.random((2, cfg.tokens)).astype(np.float32))

    def kernel_kb(pp, xx, kbias):
        return fb.fused_attn_block(
            xx, pp, cfg.heads, want_attn=True, want_mean=True,
            key_bias=kbias)

    got = jax.jit(kernel_kb)(pd, x, kb)

    def ref_kb(pp, xx, kbias):
        from interactive_vit_tpu.ops import layers as L
        h = L.layer_norm(xx, pp["ln1_s"], pp["ln1_b"], 1e-6)
        q, kk, vv = attn_ops.qkv_proj(h, pp, cfg.heads)
        out, probs = attn_ops.attention_reference(
            q, kk, vv, want_attn=True, key_bias=kbias)
        out = out.transpose(0, 2, 1, 3).reshape(xx.shape)
        return xx + L.linear(out, pp["proj_w"], pp["proj_b"]), probs

    ref_y, ref_probs = jax.jit(ref_kb)(pd, x, kb)
    record("fused_attn_block/bf16/key_bias_out",
           rel_err(got[0], ref_y), 2e-2)
    record("fused_attn_block/bf16/key_bias_probs",
           rel_err(got[1], ref_probs), 2e-2)
    record("fused_attn_block/bf16/head_mean",
           rel_err(got[2], np.asarray(ref_probs, np.float32).mean(1)),
           2e-2)


def check_int8_scores():
    """The s8 score+PV fused block (--attn int8-scores) vs the float
    reference. An accuracy CLASS: per-row symmetric s8 moves elements
    O(1/127) of their row scale — bound 3e-2, not the f32 contract."""
    import functools

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops import fused_block as fb

    cfg = vit.VARIANTS["vit_b16"]
    params = vit.init_params(jax.random.key(8), cfg)
    p = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"),
                     params["blocks"][0])
    x = jnp.asarray(np.random.default_rng(8).standard_normal(
        (2, cfg.tokens, cfg.width)).astype(np.float32) * 0.5,
        dtype="bfloat16")
    impl = functools.partial(fb.fused_attn_block, int8_scores=True)
    ref = jax.jit(lambda pp, xx: vit.block(
        pp, xx, cfg, want_attn=True))(p, x)
    got = jax.jit(lambda pp, xx: vit.block(
        pp, xx, cfg, want_attn=True, block_impl=impl))(p, x)
    record("int8_scores_block/bf16/out", rel_err(got[0], ref[0]), 3e-2)
    record("int8_scores_block/bf16/probs", rel_err(got[1], ref[1]),
           3e-2)
    probs = np.asarray(got[1], np.float32)
    record("int8_scores_block/bf16/probs_rowsum",
           float(np.max(np.abs(probs.sum(-1) - 1.0))), 1e-2)


def check_headwise():
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops import fused_block as fb

    cfg = vit.VARIANTS["vit_l16"]
    cfg = type(cfg)("vit_l384_gate", img_size=384, patch=16,
                    width=1024, depth=1, heads=16, num_classes=0)
    params = vit.init_params(jax.random.key(1), cfg)
    p = jax.tree.map(lambda a: jnp.asarray(a, "bfloat16"),
                     params["blocks"][0])
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, cfg.tokens, cfg.width)).astype(np.float32) * 0.5,
        dtype="bfloat16")
    ref = jax.jit(lambda pp, xx: vit.block(
        pp, xx, cfg, want_attn=True))(p, x)
    got = jax.jit(lambda pp, xx: vit.block(
        pp, xx, cfg, want_attn=True,
        block_impl=fb.headwise_attn_block))(p, x)
    record("headwise_attn_block/bf16/out", rel_err(got[0], ref[0]), 2e-2)
    record("headwise_attn_block/bf16/probs",
           rel_err(got[1], ref[1]), 2e-2)

    sel = jax.jit(lambda pp, xx: fb.headwise_attn_block(
        xx, pp, cfg.heads, want_attn=True, attn_heads=(0, 5)))(p, x)
    record("headwise_attn_block/bf16/attn_heads(0,5)",
           rel_err(sel[1], np.asarray(ref[1], np.float32)[:, [0, 5]]),
           2e-2)


def check_flash():
    from interactive_vit_tpu.ops import attention as attn_ops
    from interactive_vit_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(2)
    for n_real in (None, 500):
        q, k, v = (jnp.asarray(rng.standard_normal(
            (2, 6, 577, 64)).astype(np.float32) * 0.3, dtype="bfloat16")
            for _ in range(3))
        ref = jax.jit(lambda a, b, c: attn_ops.attention_reference(
            a, b, c, want_attn=True, n_real=n_real))(q, k, v)
        got = jax.jit(lambda a, b, c: fa.flash_mhsa(
            a, b, c, want_attn=True, n_real=n_real))(q, k, v)
        tag = f"n_real={n_real}"
        record(f"flash_mhsa/bf16/{tag}/out", rel_err(got[0], ref[0]),
               2e-2)
        if n_real is not None:
            # masked-out columns are padding: compare the real block
            got_p = np.asarray(got[1], np.float32)[..., :n_real, :n_real]
            ref_p = np.asarray(ref[1], np.float32)[..., :n_real, :n_real]
        else:
            got_p, ref_p = got[1], ref[1]
        record(f"flash_mhsa/bf16/{tag}/probs", rel_err(got_p, ref_p),
               2e-2)
    # no-probs online-softmax path (the long-sequence tiling)
    q, k, v = (jnp.asarray(rng.standard_normal(
        (1, 6, 1374, 64)).astype(np.float32) * 0.3, dtype="bfloat16")
        for _ in range(3))
    ref = jax.jit(lambda a, b, c: attn_ops.attention_reference(
        a, b, c))(q, k, v)
    got = jax.jit(lambda a, b, c: fa.flash_mhsa(a, b, c))(q, k, v)
    record("flash_mhsa/bf16/online_N1374/out", rel_err(got[0], ref[0]),
           2e-2)


def check_fused_mlp():
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.ops import fused_mlp as fm
    from interactive_vit_tpu.ops.layers import layer_norm, mlp

    rng = np.random.default_rng(3)
    # f32 bound 3e-4: both sides run HIGHEST-precision matmuls but with
    # different summation orders over the wide reduction — measured
    # 1.2e-4 of the output scale from rounding alone. Geometry honors
    # fm.fits per dtype: ViT-B f32 weights breach scoped VMEM (a
    # deterministic COMPILE kill, CLAUDE.md) — f32 runs ViT-S geometry.
    # ViT-S geometry for both dtypes: ViT-B f32 breaches scoped VMEM and
    # bf16 sits over fm.fits' 12M budget; the dense fused MLP is opt-in
    # (dispatch never auto-selects it) and the W8A8 check covers ViT-B
    for dtype, bound, (d, md) in (("float32", 3e-4, (384, 1536)),
                                  ("bfloat16", 2e-2, (384, 1536))):
        if not fm.fits(d, md, jnp.dtype(dtype)):
            RESULTS["checks"].append(
                {"name": f"fused_mlp_block/{dtype}", "ok": False,
                 "error": f"geometry d={d},md={md} fails fm.fits"})
            continue
        p = {"ln2_s": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
             "fc1_w": jnp.asarray(rng.standard_normal((d, md)),
                                  jnp.float32) * 0.02,
             "fc1_b": jnp.zeros((md,)),
             "fc2_w": jnp.asarray(rng.standard_normal((md, d)),
                                  jnp.float32) * 0.02,
             "fc2_b": jnp.zeros((d,))}
        pd = jax.tree.map(lambda a: jnp.asarray(a, dtype), p)
        x = jnp.asarray(rng.standard_normal(
            (2, 197, d)).astype(np.float32) * 0.5, dtype=dtype)

        def ref_fn(pp, xx):
            h = layer_norm(xx, pp["ln2_s"], pp["ln2_b"], 1e-6)
            return xx + mlp(h, pp)

        ref = jax.jit(ref_fn)(pd, x)
        got = jax.jit(lambda pp, xx: fm.fused_mlp_block(xx, pp))(pd, x)
        record(f"fused_mlp_block/{dtype}", rel_err(got, ref), bound)


def check_w8a8_mlp():
    from interactive_vit_tpu.ops import fused_mlp as fm
    from interactive_vit_tpu.ops import quant
    from interactive_vit_tpu.ops.layers import layer_norm

    rng = np.random.default_rng(4)
    d, md = 768, 3072
    w1 = (rng.standard_normal((d, md)) * 0.02).astype(np.float32)
    w2 = (rng.standard_normal((md, d)) * 0.02).astype(np.float32)
    p = {"ln2_s": jnp.ones((d,), "bfloat16"),
         "ln2_b": jnp.zeros((d,), "bfloat16"),
         "fc1_w": quant.quantize_weight(jnp.asarray(w1), mode="w8a8"),
         "fc1_b": jnp.zeros((md,), "bfloat16"),
         "fc2_w": quant.quantize_weight(jnp.asarray(w2), mode="w8a8"),
         "fc2_b": jnp.zeros((d,), "bfloat16")}
    x = jnp.asarray(rng.standard_normal(
        (2, 197, d)).astype(np.float32) * 0.5, dtype="bfloat16")

    def ref_fn(pp, xx):
        h = layer_norm(xx, pp["ln2_s"], pp["ln2_b"], 1e-6)
        h = jax.nn.gelu(quant.linear_w8a8(h, pp["fc1_w"], pp["fc1_b"]),
                        approximate=True)
        return xx + quant.linear_w8a8(h, pp["fc2_w"], pp["fc2_b"]).astype(
            xx.dtype)

    ref = jax.jit(ref_fn)(p, x)
    got = jax.jit(lambda pp, xx: fm.fused_mlp_w8a8_block(xx, pp))(p, x)
    # both sides quantize with the same semantics; residual rounding
    # differences come from f32-vs-bf16 accumulation order
    record("fused_mlp_w8a8_block/bf16", rel_err(got, ref), 3e-2)


def check_fused_window():
    from interactive_vit_tpu.models import swin
    from interactive_vit_tpu.ops import fused_window as fw

    cfg = swin.VARIANTS["swin_t"]
    params = swin.init_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(5)
    for stage, shift in ((0, 0), (0, cfg.window // 2)):
        p = params["stages"][stage][1 if shift else 0]
        res = cfg.stage_res(stage)
        c = cfg.stage_dim(stage)
        x = jnp.asarray(rng.standard_normal(
            (2, res, res, c)).astype(np.float32) * 0.5, "bfloat16")
        pd = jax.tree.map(
            lambda a: jnp.asarray(a, "bfloat16")
            if jnp.asarray(a).dtype == jnp.float32 else a, p)
        ref = jax.jit(lambda pp, xx: swin.block(
            pp, xx, cfg, stage, shift, want_attn=True))(pd, x)
        got = jax.jit(lambda pp, xx: swin.block(
            pp, xx, cfg, stage, shift, want_attn=True,
            window_impl=fw.fused_window_attn))(pd, x)
        tag = "shifted" if shift else "plain"
        record(f"fused_window_attn/bf16/{tag}/out",
               rel_err(got[0], ref[0]), 2e-2)
        record(f"fused_window_attn/bf16/{tag}/probs",
               rel_err(got[1], ref[1]), 2e-2)


def check_swin_w8a8_mlp():
    """The per-stage W8A8 MLP kernel inside swin.block vs the XLA W8A8
    reference (same quantization semantics; bound = rounding-mode noise
    + bf16 accumulation)."""
    from interactive_vit_tpu.models import swin
    from interactive_vit_tpu.ops.dispatch import default_mlp_impl
    from interactive_vit_tpu.ops.quant import quantize_tree

    cfg = swin.VARIANTS["swin_t"]
    params = swin.init_params(jax.random.key(9), cfg,
                              dtype=jnp.bfloat16)
    q = quantize_tree(params, names=frozenset({"fc1_w", "fc2_w"}),
                      mode="w8a8")
    for s in (0, len(cfg.depths) - 1):  # smallest + widest stage dims
        p = q["stages"][s][0]
        res, c = cfg.stage_res(s), cfg.stage_dim(s)
        x = jnp.asarray(np.random.default_rng(9 + s).standard_normal(
            (2, res, res, c)).astype(np.float32) * 0.5, "bfloat16")
        impl = default_mlp_impl("w8a8", dtype=jnp.bfloat16, d=c,
                                mlp_dim=c * cfg.mlp_ratio)
        ref = jax.jit(lambda pp, xx: swin.block(
            pp, xx, cfg, s, 0))(p, x)[0]
        got = jax.jit(lambda pp, xx: swin.block(
            pp, xx, cfg, s, 0, mlp_impl=impl))(p, x)[0]
        record(f"swin_w8a8_mlp/stage{s}/bf16", rel_err(got, ref), 3e-2)


def check_train_vjp():
    from interactive_vit_tpu.ops import attention as attn_ops
    from interactive_vit_tpu.ops import attention_vjp as av

    rng = np.random.default_rng(6)
    for dtype, bound in (("float32", 1e-4), ("bfloat16", 2e-2)):
        q, k, v = (jnp.asarray(rng.standard_normal(
            (2, 12, 197, 64)).astype(np.float32) * 0.3, dtype=dtype)
            for _ in range(3))

        def loss_kernel(args):
            o, _ = av.trainable_flash_mhsa(*args)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_ref(args):
            o, _ = attn_ops.attention_reference(*args)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        gk = jax.jit(jax.grad(loss_kernel))((q, k, v))
        gr = jax.jit(jax.grad(loss_ref))((q, k, v))
        for name, a, b in zip("qkv", gk, gr):
            record(f"trainable_flash_mhsa/{dtype}/d{name}",
                   rel_err(a, b), bound)


def _saliency_chain_run(reg, model, img):
    """Minimal graph: model chain + the saliency node off :head (NOT the
    full generated saliency demo — dream/occlusion would pay 30+ extra
    forwards per instance here). Returns (saliency, head_logits)."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.ir import Graph

    g = Graph()
    prev = None
    head = None
    for nm in model.list_node_names():
        n = g.add_node(nm)
        if prev is not None:
            g.connect(prev, "o", n, "o")
        if nm.endswith(":head"):
            head = n
        prev = n
    sal = g.add_node("saliency", {"target": "max", "mode": "gradxinput"})
    g.connect(head, "o", sal, "o")
    g.add_input(img, g.nodes[0], "o")
    res = Executor(reg).run(g, taps=[(sal.index, "o"), (head.index, "o")])
    return (np.asarray(res[sal.index]["o"], np.float32),
            np.asarray(res[head.index]["o"], np.float32))


def check_grad_twins():
    """Executor-level saliency grad replay: kernels-on model vs its XLA
    twin (same seed/dtype) — the exact path the round-3 trace-time
    failure class lived on. CPU cannot run this (dispatch disables
    kernels there).

    Every case here serves a PALLAS path when kernels=True, so the two
    instances must genuinely diverge — asserted by the paths_diverge
    rows (on TPU only; interpret-mode smoke runs the same math twice).
    Weight-only int8 does NOT belong here: it runs the XLA path
    regardless of kernels=, making kernels-on vs kernels-off a
    tautology (the r4 max_err==0.0 rows) — its real check is
    check_int8_weight_only below."""
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.autoregister import make_model
    from interactive_vit_tpu.ops.node_ops import register_builtin

    cases = [
        ("vit_t16", {"dtype": "bfloat16"}, 5e-2),
        ("swin_t", {"dtype": "bfloat16"}, 5e-2),
        ("vit_s16_tome", {"dtype": "bfloat16"}, 5e-2),
    ]
    rng = np.random.default_rng(7)
    img = rng.random((3, 224, 224), np.float32)
    for variant, kw, bound in cases:
        outs = {}
        for kernels in (True, False):
            reg = Registry()
            register_builtin(reg)
            model = make_model(variant, kernels=kernels, **kw)
            model.register(reg)
            outs[kernels] = _saliency_chain_run(reg, model, img)
        tag = kw["dtype"]
        # the saliency VALUE rides the XLA twin in BOTH instances (the
        # grad replay re-traces through grad_safe_fn), so this asserts
        # the twin traces + evaluates identically regardless of the
        # serving kernels — the round-3 failure class was a trace-time
        # crash here
        record(f"grad_twin/{variant}/{tag}/saliency",
               rel_err(outs[True][0], outs[False][0]), bound)
        # twin-vs-kernel SEMANTIC drift check: the served forward (head
        # logits, kernels on) must match the XLA math the twin
        # attributes against
        fwd_err = rel_err(outs[True][1], outs[False][1])
        record(f"grad_twin/{variant}/{tag}/fwd_vs_twin", fwd_err, bound)
        if RESULTS["platform"] == "tpu":
            # kernels-on must actually BE a different program than the
            # XLA twin (Pallas bf16 rounding differs); exactly 0.0 means
            # the comparison is a path compared to itself
            record_nonzero(f"grad_twin/{variant}/{tag}/paths_diverge",
                           fwd_err)


def check_int8_weight_only():
    """Weight-only int8 serving vs the DEQUANTIZED-weight dense
    reference — the real int8 contract (replaces the r4 tautology rows,
    VERDICT r4 weak #3): the int8 runtime path (per-channel s8 weights
    dequantized inside the matmuls; grad twin attributes through the
    dequantized math since round() has zero grad) must match a dense
    model built from ``dequantize_weight`` of the SAME quantized leaves,
    and must genuinely differ from the unquantized original (else the
    quantize flag silently didn't engage)."""
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.autoregister import make_model
    from interactive_vit_tpu.ops import quant
    from interactive_vit_tpu.ops.node_ops import register_builtin

    cfg = vit.VARIANTS["vit_t16"]
    params = vit.init_params(jax.random.key(7), cfg, dtype=jnp.bfloat16)
    qparams = quant.quantize_tree(params)

    def dq_walk(obj):
        if quant.is_quantized(obj) or quant.is_w8a8(obj):
            return quant.dequantize_weight(obj, jnp.bfloat16)
        if isinstance(obj, dict):
            return {k: dq_walk(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [dq_walk(v) for v in obj]
        if isinstance(obj, tuple):
            return tuple(dq_walk(v) for v in obj)
        return obj

    dq_params = dq_walk(qparams)
    rng = np.random.default_rng(11)
    img = rng.random((3, 224, 224), np.float32)
    runs = {}
    for tag, p, kw in [
        ("int8", params, {"quantize": True}),
        ("dequant", dq_params, {}),
        ("dense", params, {}),
    ]:
        reg = Registry()
        register_builtin(reg)
        model = make_model("vit_t16", params=p, dtype=jnp.bfloat16,
                           **kw)
        model.register(reg)
        runs[tag] = _saliency_chain_run(reg, model, img)
    # int8 runtime == dequantized dense math, up to accumulation-order
    # noise (bf16 matmuls associate differently around the scale mul)
    record("int8_weight_only/vit_t16/fwd_vs_dequant",
           rel_err(runs["int8"][1], runs["dequant"][1]), 2e-2)
    # the int8 model's grad twin attributes through dequantized weights
    # (round() has zero grad), so its saliency must track the dequant
    # model's — an equality CONTRACT between two independently built
    # instances (0.0 here means the twin uses exactly the dequantized
    # values, which is the spec — not a path compared to itself)
    record("int8_weight_only/vit_t16/saliency_vs_dequant",
           rel_err(runs["int8"][0], runs["dequant"][0]), 8e-2)
    # quantization must have engaged: int8 forward AND saliency differ
    # from the UNQUANTIZED original (weights moved by up to scale/2) —
    # exactly-0.0 here would mean the quantize flag was silently ignored
    record_nonzero("int8_weight_only/vit_t16/quant_engaged",
                   rel_err(runs["int8"][1], runs["dense"][1]))
    record_nonzero("int8_weight_only/vit_t16/quant_visible_in_saliency",
                   rel_err(runs["int8"][0], runs["dense"][0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--only", default="",
                    help="comma-separated check-fn suffixes to run")
    args = ap.parse_args()

    if os.environ.get("IVT_GATE_INTERPRET") == "1":
        # CPU smoke mode: validates the script's wiring before a TPU
        # run (Pallas interpret mode; NOT a substitute for the chip)
        import functools

        import jax.experimental.pallas as pl_mod

        jax.config.update("jax_platforms", "cpu")
        pl_mod.pallas_call = functools.partial(
            pl_mod.pallas_call, interpret=True)

    # persistent compile cache: a re-run (or a round-close re-gate)
    # skips the 20-40s-per-program tunnel compiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/ivt_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass

    RESULTS["platform"] = jax.devices()[0].platform
    print("platform:", RESULTS["platform"], flush=True)
    t0 = time.time()
    checks = [check_fused_block, check_int8_scores, check_headwise,
              check_flash, check_fused_mlp, check_w8a8_mlp,
              check_fused_window, check_swin_w8a8_mlp,
              check_train_vjp, check_grad_twins,
              check_int8_weight_only]
    only = [s for s in args.only.split(",") if s]
    for fn in checks:
        if only and not any(fn.__name__.endswith(s) for s in only):
            continue
        t1 = time.time()
        try:
            fn()
        except Exception as err:  # noqa: BLE001 — a crashed check FAILS
            # keep 2KB: the real OOM/vmem detail sits ~1.5KB past the
            # compile helper's landlock preamble (CLAUDE.md)
            RESULTS["checks"].append(
                {"name": fn.__name__, "ok": False,
                 "error": f"{type(err).__name__}: {err}"[:2000]})
            print(f"FAIL {fn.__name__}: {err}", flush=True)
        print(f"  [{fn.__name__}: {time.time() - t1:.1f}s]", flush=True)

    # an empty run is a FAILED gate, not a green one (a --only typo or
    # a filtered-out list must never write ok=true with zero checks)
    RESULTS["ok"] = bool(RESULTS["checks"]) and all(
        c["ok"] for c in RESULTS["checks"])
    RESULTS["n_checks"] = len(RESULTS["checks"])
    RESULTS["wall_s"] = round(time.time() - t0, 1)
    out = os.path.join(_REPO, f"KERNELS_r{args.round:02d}.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"wrote {out}: ok={RESULTS['ok']} "
          f"({RESULTS['n_checks']} checks, {RESULTS['wall_s']}s)")
    return 0 if RESULTS["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())

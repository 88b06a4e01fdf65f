"""Fused attention-block Pallas kernel vs the unfused reference path."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_block as fb


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(
        fb.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )


CFG = vit.ViTConfig("vit_fb", img_size=32, patch=16, width=64,
                    depth=2, heads=4, num_classes=10)


def test_block_matches_unfused():
    params = vit.init_params(jax.random.key(0), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(0).random((2, CFG.tokens, CFG.width), np.float32)
    )
    ref, ref_probs, _ = vit.block(p, x, CFG, want_attn=True)
    got, probs, _ = vit.block(p, x, CFG, want_attn=True,
                           block_impl=fb.fused_attn_block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)


def test_block_no_probs():
    params = vit.init_params(jax.random.key(1), CFG)
    p = params["blocks"][1]
    x = jnp.asarray(
        np.random.default_rng(1).random((1, CFG.tokens, CFG.width), np.float32)
    )
    ref, _, _ = vit.block(p, x, CFG, want_attn=False)
    got, probs, _ = vit.block(p, x, CFG, want_attn=False,
                           block_impl=fb.fused_attn_block)
    assert probs is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_full_forward_with_fused_blocks():
    params = vit.init_params(jax.random.key(2), CFG)
    x = jnp.asarray(
        np.random.default_rng(2).random((2, 3, 32, 32), np.float32)
    )
    ref = vit.forward(params, x, CFG, want_attn=True)
    got = vit.forward(params, x, CFG, want_attn=True,
                      block_impl=fb.fused_attn_block)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["rollout"]),
                               np.asarray(ref["rollout"]), atol=1e-5)


def test_block_mean_emission():
    """In-kernel head-mean == mean over the emitted per-head probs."""
    params = vit.init_params(jax.random.key(5), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(5).random((2, CFG.tokens, CFG.width), np.float32)
    )
    y, probs, mean = fb.fused_attn_block(x, p, CFG.heads, CFG.ln_eps,
                                         want_attn=True, want_mean=True)
    assert mean.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(probs).mean(axis=1), atol=1e-6)
    # mean-only (the "r"-tap-only serving path): no per-head tensor at all
    y2, probs2, mean2 = fb.fused_attn_block(x, p, CFG.heads, CFG.ln_eps,
                                            want_attn=False, want_mean=True)
    assert probs2 is None
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_headwise_packed_matches_fused():
    """dh divides 128 and heads % (128/dh) == 0 -> the packed (no-qkv-
    transpose) path; parity against the per-image fused kernel."""
    cfg = vit.ViTConfig("vit_fb_packed", img_size=32, patch=16, width=128,
                        depth=1, heads=4, num_classes=10)
    params = vit.init_params(jax.random.key(7), cfg)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(7).random((2, cfg.tokens, cfg.width),
                                        np.float32)
    )
    ref, ref_probs, ref_mean = fb.fused_attn_block(
        x, p, cfg.heads, cfg.ln_eps, want_attn=True, want_mean=True)
    got, probs, mean = fb.headwise_attn_block(
        x, p, cfg.heads, cfg.ln_eps, want_attn=True, want_mean=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               atol=1e-5)


def test_headwise_mean_emission():
    params = vit.init_params(jax.random.key(6), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(6).random((2, CFG.tokens, CFG.width), np.float32)
    )
    y, probs, mean = fb.headwise_attn_block(x, p, CFG.heads, CFG.ln_eps,
                                            want_attn=True, want_mean=True)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(probs).mean(axis=1), atol=1e-6)
    y2, probs2, mean2 = fb.headwise_attn_block(x, p, CFG.heads, CFG.ln_eps,
                                               want_mean=True)
    assert probs2 is None
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean), atol=1e-6)


def test_fits_estimator():
    # ViT-B with maps fits; ViT-L's 16-head probs tap does not
    assert fb.fits(197, 768, 12, jnp.bfloat16)
    assert not fb.fits(577, 1024, 16, jnp.bfloat16)


def test_headwise_matches_unfused():
    params = vit.init_params(jax.random.key(3), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(3).random((2, CFG.tokens, CFG.width), np.float32)
    )
    # the headwise kernel covers only the attention branch; compare that
    from interactive_vit_tpu.ops import layers as L
    from interactive_vit_tpu.ops.attention import mhsa

    h, ref_probs = mhsa(
        L.layer_norm(x, p["ln1_s"], p["ln1_b"], CFG.ln_eps),
        p, CFG.heads, want_attn=True,
    )
    ref = x + h
    got, probs = fb.headwise_attn_block(x, p, CFG.heads, CFG.ln_eps,
                                        want_attn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)


def test_headwise_no_probs():
    params = vit.init_params(jax.random.key(4), CFG)
    p = params["blocks"][1]
    x = jnp.asarray(
        np.random.default_rng(4).random((1, CFG.tokens, CFG.width), np.float32)
    )
    got, probs = fb.headwise_attn_block(x, p, CFG.heads, CFG.ln_eps)
    assert probs is None
    ref, _ = fb.fused_attn_block(x, p, CFG.heads, CFG.ln_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_selective_head_taps_all_impls():
    """attn_heads=[1,3] emits exactly those heads' maps [B,2,N,N], equal
    to the corresponding slices of the full tap, on all three impls
    (fused kernel static-emission, headwise XLA-recompute, XLA slice) —
    and y is unchanged (VERDICT r2 #3)."""
    params = vit.init_params(jax.random.key(3), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(3).random((2, CFG.tokens, CFG.width),
                                        np.float32)
    )
    ref_y, ref_probs, ref_mean = vit.block(p, x, CFG, want_attn=True,
                                           want_mean=True)
    sel = (1, 3)
    for impl in (None, fb.fused_attn_block, fb.headwise_attn_block):
        y, probs, mean = vit.block(p, x, CFG, want_attn=True,
                                   want_mean=True, block_impl=impl,
                                   attn_heads=sel)
        assert probs.shape == (2, 2, CFG.tokens, CFG.tokens), impl
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   atol=1e-5, err_msg=str(impl))
        np.testing.assert_allclose(
            np.asarray(probs), np.asarray(ref_probs)[:, list(sel)],
            atol=1e-5, err_msg=str(impl))
        # the rollout mean still averages ALL heads, not just the tapped
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   atol=1e-5, err_msg=str(impl))

    with pytest.raises(ValueError, match="out of range"):
        vit.block(p, x, CFG, want_attn=True, attn_heads=(0, 99))


def test_selective_head_taps_via_node_param():
    """The attn_heads NODE param flows through the plugin tier: a block
    node with attn_heads="[0,2]" serves [B,2,N,N] on its attn channel,
    and editing the list recompiles (static param, in the signature)."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.ir import Graph
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.vit_plugin import make_vit_model
    from interactive_vit_tpu.wire.schema import GraphLibrary

    vit.VARIANTS["vit_fb"] = CFG
    reg = Registry()
    try:
        import tempfile

        lib = GraphLibrary(tempfile.mkdtemp())
        make_vit_model("vit_fb", kernels=False).register(reg, lib)
        ex = Executor(reg)

        def graph(heads_param):
            g = Graph()
            n0 = g.add_node("vit_fb:embed")
            params = {"attn_heads": heads_param} if heads_param else {}
            n1 = g.add_node("vit_fb:blocks.0", params)
            g.connect(n0, "o", n1, "o")
            g.add_input(np.random.default_rng(0).random(
                (3, 32, 32)).astype(np.float32), n0, "o")
            return g

        full = ex.run(graph(None), taps=[(1, "attn")])
        sel = ex.run(graph("[0,2]"), taps=[(1, "attn")])
        assert not ex.last_stats.cache_hit  # static param -> new program
        a_full = np.asarray(full[1]["attn"])
        a_sel = np.asarray(sel[1]["attn"])
        assert a_sel.shape[1] == 2 and a_full.shape[1] == CFG.heads
        np.testing.assert_allclose(a_sel, a_full[:, [0, 2]], atol=1e-5)

        # "[]" means ALL heads (the UI placeholder contract), never a
        # zero-head tap (a zero-size Pallas block is a fatal compile)
        empty = ex.run(graph("[]"), taps=[(1, "attn")])
        assert np.asarray(empty[1]["attn"]).shape[1] == CFG.heads
    finally:
        del vit.VARIANTS["vit_fb"]


def test_block_key_bias_and_metric_match_reference():
    """ToMe integration surface: proportional attention (key_bias) and
    the head-mean key metric emitted in-kernel match the XLA reference
    (attention_reference(key_bias=) + k.mean(heads))."""
    from interactive_vit_tpu.ops import attention as attn_ops
    from interactive_vit_tpu.ops import layers as L

    params = vit.init_params(jax.random.key(2), CFG)
    p = params["blocks"][0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, CFG.tokens, CFG.width), np.float32))
    s = jnp.asarray(1.0 + rng.random((2, CFG.tokens), np.float32) * 6.0)
    kb = jnp.log(s)

    # XLA reference: LN -> qkv -> biased attention -> proj -> residual
    xa = L.layer_norm(x, p["ln1_s"], p["ln1_b"], CFG.ln_eps)
    q, k, v = attn_ops.qkv_proj(xa, p, CFG.heads)
    out, ref_probs = attn_ops.attention_reference(
        q, k, v, want_attn=True, key_bias=kb)
    out = out.transpose(0, 2, 1, 3).reshape(x.shape)
    ref_y = x + L.linear(out, p["proj_w"], p["proj_b"])
    ref_metric = k.astype(jnp.float32).mean(axis=1)

    y, probs, mean, metric = fb.fused_attn_block(
        x, p, CFG.heads, CFG.ln_eps, want_attn=True, want_mean=True,
        key_bias=kb, want_metric=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mean),
        np.asarray(ref_probs).astype(np.float32).mean(axis=1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(metric), np.asarray(ref_metric),
                               atol=1e-5)

    # metric-only (maps-off merge path): 3-tuple (y, None, metric)
    y2, probs2, metric2 = fb.fused_attn_block(
        x, p, CFG.heads, CFG.ln_eps, key_bias=kb, want_metric=True)
    assert probs2 is None
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref_y),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(metric2), np.asarray(ref_metric),
                               atol=1e-5)


def test_int8_scores_variant_close_to_reference():
    """--attn int8-scores: s8 score+PV dots. An ACCURACY CLASS, not a
    bit-exact path — bound the perturbation vs the float reference
    (per-row symmetric s8: elementwise q/k error <= absmax/254, so
    logits move O(1/127) of their scale; probs rows still sum to 1)."""
    params = vit.init_params(jax.random.key(5), CFG)
    p = params["blocks"][0]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, CFG.tokens, CFG.width), np.float32))
    ref, ref_probs, _ = vit.block(p, x, CFG, want_attn=True)
    got, probs, _ = vit.block(
        p, x, CFG, want_attn=True,
        block_impl=functools.partial(fb.fused_attn_block,
                                     int8_scores=True))
    probs = np.asarray(probs, np.float32)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=5e-3)
    assert np.max(np.abs(probs - np.asarray(ref_probs))) < 3e-2
    scale = np.max(np.abs(np.asarray(ref)))
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 3e-2 * scale

    # maps-off path (deferred normalization + s8 PV) stays consistent
    # with the maps-on path of the SAME variant
    got2, probs2, _ = vit.block(
        p, x, CFG, want_attn=False,
        block_impl=functools.partial(fb.fused_attn_block,
                                     int8_scores=True))
    assert probs2 is None
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               atol=2e-2 * scale)


def test_int8_scores_dispatch_name():
    """ops.dispatch resolves 'int8-scores' to the flagged kernel and
    refuses geometries the fused block cannot hold."""
    import jax.numpy as jnp

    from interactive_vit_tpu.ops.dispatch import default_block_impl

    impl = default_block_impl("int8-scores", dtype=jnp.bfloat16,
                              n=CFG.tokens, d=CFG.width, heads=CFG.heads)
    assert impl.keywords == {"int8_scores": True, "int8_pv": True}
    qk = default_block_impl("int8-scores-qk", dtype=jnp.bfloat16,
                            n=CFG.tokens, d=CFG.width, heads=CFG.heads)
    assert qk.keywords == {"int8_scores": True, "int8_pv": False}
    with pytest.raises(ValueError):
        default_block_impl("int8-scores", dtype=jnp.bfloat16,
                           n=4096, d=8192, heads=64)

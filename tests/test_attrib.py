"""Chefer attention attribution (models/attrib.py).

Pins (a) the delta-injection construction — the attribution trunk serves
the same logits as the chained nodes, and the one-backward per-block
attention gradients match independently computed per-block gradients;
(b) the Chefer relevance math properties; (c) the product surface — the
``:attrib`` node through the staged executor, dynamic class scrubbing on
the cached program, the quantized-model dequant path, and the generated
demo graph wiring. No reference analog: the reference server evaluated
under ``torch.no_grad()`` (``/root/reference/main/context.py:79-88``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.models.attrib import (
    chefer_relevance, trunk_with_attn_grads,
)
from interactive_vit_tpu.ops.node_ops import register_builtin

CFG = vit.ViTConfig("vit_att", img_size=32, patch=16, width=64,
                    depth=2, heads=4, num_classes=10)


@pytest.fixture
def model_reg():
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    r = Registry()
    register_builtin(r)
    vit.VARIANTS["vit_att"] = CFG
    try:
        model = make_vit_model("vit_att")
        model.register(r)
    finally:
        del vit.VARIANTS["vit_att"]
    return r, model


def _tokens(model, seed=0, batch=2):
    img = np.random.default_rng(seed).random(
        (batch, 3, 32, 32)).astype(np.float32)
    return vit.embed(model.params, jnp.asarray(img), CFG), img


def _trunk_caps(model):
    p = model.params
    return {"blocks": p["blocks"], "norm": p["norm"], "head": p["head"]}


def _scalar_max(logits):
    return jnp.sum(jnp.max(logits.astype(jnp.float32), axis=-1))


def test_trunk_logits_match_chain(model_reg):
    # zero deltas leave the forward unchanged: the attribution trunk's
    # logits equal blocks -> norm -> head on the same tokens
    _r, model = model_reg
    x, _ = _tokens(model)
    _p, _g, logits = trunk_with_attn_grads(
        _trunk_caps(model), x, CFG, _scalar_max)
    y = x
    for bp in model.params["blocks"]:
        y, _, _ = vit.block(bp, y, CFG)
    expect = vit.head(model.params, vit.final_norm(
        model.params, y[:, : CFG.prefix_tokens], CFG))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(expect),
                               atol=1e-5)


def test_one_backward_matches_per_block_grads(model_reg):
    # the delta-tuple gradient equals L independent single-block
    # injections — the construction in the module docstring
    _r, model = model_reg
    x, _ = _tokens(model, batch=1)
    caps = _trunk_caps(model)
    probs, grads, _ = trunk_with_attn_grads(caps, x, CFG, _scalar_max)
    assert len(probs) == CFG.depth and len(grads) == CFG.depth
    n = x.shape[1]

    def single(li):
        def f(dl):
            y = x
            for i, bp in enumerate(caps["blocks"]):
                store = []
                from interactive_vit_tpu.models.attrib import (
                    _make_inject_impl,
                )
                d = dl if i == li else jnp.zeros_like(dl)
                y, _, _ = vit.block(
                    bp, y, CFG, attn_impl=_make_inject_impl(d, store))
            logits = vit.head(caps, vit.final_norm(
                {"norm": caps["norm"]}, y[:, : CFG.prefix_tokens], CFG))
            return _scalar_max(logits)

        return jax.grad(f)(jnp.zeros((1, CFG.heads, n, n), jnp.float32))

    for li in range(CFG.depth):
        np.testing.assert_allclose(
            np.asarray(grads[li]), np.asarray(single(li)), atol=1e-5)
    # probs are genuine attention rows: softmax mass 1
    np.testing.assert_allclose(
        np.asarray(probs[0]).sum(-1), 1.0, atol=1e-5)


def test_chefer_relevance_properties(model_reg):
    _r, model = model_reg
    x, _ = _tokens(model)
    probs, grads, _ = trunk_with_attn_grads(
        _trunk_caps(model), x, CFG, _scalar_max)
    rel = np.asarray(chefer_relevance(probs, grads, x.dtype))
    n = x.shape[1]
    assert rel.shape == (x.shape[0], n, n)
    # identity + sums of ReLU'd products: nonnegative, diagonal >= 1
    assert rel.min() >= 0.0
    assert np.all(np.diagonal(rel, axis1=1, axis2=2) >= 1.0 - 1e-6)


def test_attrib_class_specific(model_reg):
    # different target classes produce different relevance (rollout is
    # class-agnostic — class sensitivity is the node's whole point)
    _r, model = model_reg
    x, _ = _tokens(model)
    caps = _trunk_caps(model)

    def rel_for(c):
        def s(logits):
            return jnp.sum(logits.astype(jnp.float32)[..., c])

        p, g, _ = trunk_with_attn_grads(caps, x, CFG, s)
        return np.asarray(chefer_relevance(p, g, x.dtype))

    assert np.abs(rel_for(0) - rel_for(7)).max() > 1e-6


def _attrib_graph(reg, model, params=None):
    g = Graph()
    emb = g.add_node("vit_att:embed")
    b0 = g.add_node("vit_att:blocks.0")
    b1 = g.add_node("vit_att:blocks.1")
    nrm = g.add_node("vit_att:norm")
    head = g.add_node("vit_att:head")
    att = g.add_node("vit_att:attrib", params or {"target": "max"})
    g.connect(emb, "o", b0, "o")
    g.connect(b0, "o", b1, "o")
    g.connect(b1, "o", nrm, "o")
    g.connect(nrm, "o", head, "o")
    g.connect(emb, "o", att, "o")
    img = np.random.default_rng(3).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(img, emb, "o")
    return g, att.index, head.index


def test_attrib_node_through_executor(model_reg):
    reg, model = model_reg
    ex = Executor(reg)
    g, att, head = _attrib_graph(reg, model)
    out = ex.run(g, taps={(att, "o"), (att, "rel"), (att, "logits"),
                          (head, "o")})
    heat = out[att]["o"]
    # 32/16 = 2x2 patch grid, CLS dropped
    assert heat.shape == (1, 3, 2, 2)
    assert float(heat.max()) == pytest.approx(1.0, abs=1e-5)
    assert float(heat.min()) >= 0.0
    assert out[att]["rel"].shape == (1, 5, 5)
    # the node's internal trunk serves the SAME logits as the chain
    np.testing.assert_allclose(out[att]["logits"], out[head]["o"],
                               atol=1e-5)


def test_attrib_class_dynamic_no_recompile(model_reg):
    reg, model = model_reg
    ex = Executor(reg)
    g, att, _ = _attrib_graph(reg, model,
                              {"target": "class", "class": "0"})
    o0 = np.asarray(ex.run(g, taps={(att, "rel")})[att]["rel"])
    assert ex.last_stats.cache_hit is False
    g.nodes[att].params["class"] = "7"
    o7 = np.asarray(ex.run(g, taps={(att, "rel")})[att]["rel"])
    assert ex.last_stats.cache_hit is True  # class rides as a capture
    assert np.abs(o0 - o7).max() > 1e-6


def test_attrib_quantized_model():
    # weight-only int8 model: the attrib trunk dequantizes inline
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    r = Registry()
    register_builtin(r)
    vit.VARIANTS["vit_att"] = CFG
    try:
        model = make_vit_model("vit_att", quantize=True)
        model.register(r)
    finally:
        del vit.VARIANTS["vit_att"]
    ex = Executor(r)
    g, att, _ = _attrib_graph(r, model)
    out = ex.run(g, taps={(att, "o"), (att, "rel")})
    assert np.isfinite(out[att]["rel"]).all()
    assert float(out[att]["o"].max()) == pytest.approx(1.0, abs=1e-5)


def test_attrib_in_generated_demo_graph(model_reg):
    _r, model = model_reg
    obj = model.generate_saliency_graph_json()
    kinds = [n["instance"].get("endpoint", "") for n in obj["nodes"]]
    ai = kinds.index("vit_att:attrib")
    emb = kinds.index("vit_att:embed")
    # wired from the embed node, feeding an img_view
    assert any(e["in_port"]["node"] == emb and e["out_port"]["node"] == ai
               for e in obj["edges"])
    views = [i for i, n in enumerate(obj["nodes"])
             if n["instance"].get("kind") == "img_view"]
    assert any(e["in_port"]["node"] == ai and e["out_port"]["node"] in views
               for e in obj["edges"])


def test_attrib_bad_target_attributed(model_reg):
    from interactive_vit_tpu.graph.executor import NodeError

    reg, model = model_reg
    ex = Executor(reg)
    g, att, _ = _attrib_graph(reg, model, {"target": "nope"})
    with pytest.raises(NodeError) as ei:
        ex.run(g, taps={(att, "o")})
    assert ei.value.node_index == att


def test_attrib_on_mesh_matches_unsharded(model_reg):
    # DPxTP mesh serving: the attrib node's trunk captures TP-shard per
    # param_spec (the "/trunk/blocks/..." paths suffix-match the rules)
    # and GSPMD partitions the forward+backward; taps match 1-device
    from interactive_vit_tpu.parallel.mesh import make_mesh

    reg, model = model_reg
    g1, att, _ = _attrib_graph(reg, model)
    ref = np.asarray(Executor(reg)
                     .run(g1, taps={(att, "rel")})[att]["rel"])
    g2, att2, _ = _attrib_graph(reg, model)
    mesh = make_mesh({"data": 4, "model": 2})
    got = np.asarray(Executor(reg, mesh=mesh)
                     .run(g2, taps={(att2, "rel")})[att2]["rel"])
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_attrib_head_major_layout_matches():
    # the mesh TP layout (head-major qkv columns): same relevance
    from interactive_vit_tpu.parallel.mesh import permute_qkv_head_major
    from interactive_vit_tpu.models.attrib import (
        chefer_relevance, trunk_with_attn_grads,
    )

    params = vit.init_params(jax.random.key(5), CFG)
    x = vit.embed(params, jnp.asarray(np.random.default_rng(1).random(
        (1, 3, 32, 32), dtype=np.float32)), CFG)
    caps = {"blocks": params["blocks"], "norm": params["norm"],
            "head": params["head"]}
    p0, g0, l0 = trunk_with_attn_grads(caps, x, CFG, _scalar_max)
    perm = permute_qkv_head_major(params, CFG.heads)
    capsp = {"blocks": perm["blocks"], "norm": perm["norm"],
             "head": perm["head"]}
    p1, g1, l1 = trunk_with_attn_grads(capsp, x, CFG, _scalar_max,
                                       qkv_head_major=True)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), atol=1e-5)
    r0 = chefer_relevance(p0, g0, x.dtype)
    r1 = chefer_relevance(p1, g1, x.dtype)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=1e-5)


def test_attrib_stacked_distinct_classes(model_reg):
    # two concurrent sessions scrubbing different classes share one
    # vmapped program: dynamic_capture_keys names only "class", so the
    # trunk WEIGHTS broadcast instead of stacking k copies
    reg, model = model_reg
    ex = Executor(reg)
    g0, att, _ = _attrib_graph(reg, model,
                               {"target": "class", "class": "0"})
    g7, _, _ = _attrib_graph(reg, model,
                             {"target": "class", "class": "7"})
    res = ex.run_stacked([g0, g7], taps={(att, "rel")})
    ref0 = np.asarray(ex.run(g0, taps={(att, "rel")})[att]["rel"])
    ref7 = np.asarray(ex.run(g7, taps={(att, "rel")})[att]["rel"])
    np.testing.assert_allclose(np.asarray(res[0][att]["rel"]), ref0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(res[1][att]["rel"]), ref7,
                               atol=1e-5)

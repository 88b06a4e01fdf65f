"""Gradient-tap (saliency) node: jax.grad through the staged executor.

The reference server ran every node under ``torch.no_grad()`` on CPU
(``/root/reference/main/context.py:79-88``) — gradients are a capability
this framework adds. These tests pin the math against hand-derived
analytic gradients through small graphs, and the product behaviors
(dynamic class scrubbing without recompiles, micro-batched stacking,
per-node error attribution, eager-path isolation) against the executor
contracts.
"""

import numpy as np
import pytest

from interactive_vit_tpu.graph.executor import Executor, NodeError
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.ops.node_ops import register_builtin


@pytest.fixture
def reg():
    r = Registry()
    register_builtin(r)
    return r


@pytest.fixture
def ex(reg):
    return Executor(reg)


def chain_graph(x, sal_params, mid=("cos", {"A": "2.0", "b": "0.5"})):
    """input -> mid node -> saliency; returns (graph, sal node index)."""
    g = Graph()
    m = g.add_node(mid[0], mid[1])
    s = g.add_node("saliency", sal_params)
    g.connect(m, "o", s, "o")
    g.add_input(np.asarray(x, np.float32), m, "o")
    return g, s.index


def test_grad_matches_analytic_cos(ex):
    # y = cos(2x + 0.5); target=sum => d/dx sum(y) = -2 sin(2x + 0.5)
    x = np.linspace(-1.0, 1.0, 12, dtype=np.float32).reshape(3, 4)
    g, s = chain_graph(x, {"target": "sum"})
    out = ex.run(g, taps={(s, "o"), (s, "g")})
    expect = -2.0 * np.sin(2.0 * x + 0.5)
    np.testing.assert_allclose(out[s]["g"], expect, atol=1e-5)
    # "o" is the normalized |grad| heatmap in [0, 1]
    heat = out[s]["o"]
    assert heat.shape == x.shape
    assert heat.max() == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(
        heat, np.abs(expect) / np.abs(expect).max(), atol=1e-5)


def test_target_max_one_hot_rows(ex):
    # identity upstream: d(max per row, summed)/dx = one-hot at each
    # row's argmax
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    g = Graph()
    s = g.add_node("saliency", {"target": "max"}).index
    g.add_input(x, g.nodes[s], "o")
    out = ex.run(g, taps={(s, "g")})
    expect = np.zeros_like(x)
    expect[np.arange(4), x.argmax(axis=1)] = 1.0
    np.testing.assert_allclose(out[s]["g"], expect, atol=1e-6)


def test_target_class_selects_column(ex):
    # y = cos(x); target=class c: d sum(y[:, c]) / dx = -sin(x) one-hot col
    x = np.linspace(0.1, 2.0, 12, dtype=np.float32).reshape(3, 4)
    g, s = chain_graph(x, {"target": "class", "class": "2"},
                       mid=("cos", {"A": "1.0", "b": "0.0"}))
    out = ex.run(g, taps={(s, "g")})
    expect = np.zeros_like(x)
    expect[:, 2] = -np.sin(x[:, 2])
    np.testing.assert_allclose(out[s]["g"], expect, atol=1e-5)


def test_class_is_dynamic_no_recompile(ex):
    x = np.linspace(0.1, 2.0, 12, dtype=np.float32).reshape(3, 4)
    g, s = chain_graph(x, {"target": "class", "class": "1"},
                       mid=("cos", {"A": "1.0", "b": "0.0"}))
    ex.run(g, taps={(s, "g")})
    assert not ex.last_stats.cache_hit
    # scrub the class: same program, new capture value
    g.nodes[s].params["class"] = "3"
    out = ex.run(g, taps={(s, "g")})
    assert ex.last_stats.cache_hit
    expect = np.zeros_like(x)
    expect[:, 3] = -np.sin(x[:, 3])
    np.testing.assert_allclose(out[s]["g"], expect, atol=1e-5)


def test_gradxinput_and_ig_linear_agree(ex):
    # For a LINEAR upstream (binop * const), IG and grad*input are exactly
    # equal: f(x) = w*x => IG = x * mean_a grad(f)(a x) = x*w = gradxinput.
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5)).astype(np.float32)
    w = rng.normal(size=(2, 5)).astype(np.float32)

    def build(mode):
        g = Graph()
        b = g.add_node("binop", {"op": "*"})
        s = g.add_node("saliency",
                       {"target": "sum", "mode": mode, "steps": "4"})
        g.connect(b, "c", s, "o")
        g.add_input(x, b, "a")
        g.add_input(w, b, "b")
        return g, s.index

    g1, s1 = build("gradxinput")
    g2, s2 = build("ig")
    gxi = ex.run(g1, taps={(s1, "g")})[s1]["g"]
    ig = ex.run(g2, taps={(s2, "g")})[s2]["g"]
    np.testing.assert_allclose(gxi, x * w, atol=1e-5)
    np.testing.assert_allclose(ig, gxi, atol=1e-4)


def test_wrt_selects_input(ex):
    # two inputs; wrt=1 differentiates against the second (the multiplier)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3,)).astype(np.float32)
    w = rng.normal(size=(3,)).astype(np.float32)
    g = Graph()
    b = g.add_node("binop", {"op": "*"})
    s = g.add_node("saliency", {"target": "sum", "wrt": "1"}).index
    g.connect(b, "c", g.nodes[s], "o")
    g.add_input(x, b, "a")
    g.add_input(w, b, "b")
    out = ex.run(g, taps={(s, "g")})
    np.testing.assert_allclose(out[s]["g"], x, atol=1e-6)


def test_heatmap_chw_channel_collapse(ex):
    # CHW-shaped gradient: heat = per-pixel max |grad| over C, normalized,
    # broadcast back to 3 channels (img_view-ready)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    g = Graph()
    s = g.add_node("saliency", {"target": "sum", "mode": "gradxinput"}).index
    g.add_input(x, g.nodes[s], "o")
    out = ex.run(g, taps={(s, "o"), (s, "g")})
    attr = out[s]["g"]
    np.testing.assert_allclose(attr, x, atol=1e-6)  # d sum(x)/dx * x = x
    h = np.abs(attr).max(axis=1, keepdims=True)
    h = h / h.max(axis=(1, 2, 3), keepdims=True)
    expect = np.broadcast_to(h, (2, 3, 4, 4))
    np.testing.assert_allclose(out[s]["o"], expect, atol=1e-6)
    assert out[s]["o"].shape == x.shape


def test_independent_of_wrt_raises_node_error(ex):
    # saliency wired to a tensor that does NOT depend on the wrt input
    x = np.ones((2, 2), np.float32)
    y = np.ones((2, 2), np.float32)
    g2 = Graph()
    c2 = g2.add_node("cos", {})
    v2 = g2.add_node("img_view", {})
    s2 = g2.add_node("saliency", {"target": "sum", "wrt": "1"}).index
    g2.connect(c2, "o", g2.nodes[s2], "o")
    g2.add_input(x, c2, "o")        # input 0 -> cone
    g2.add_input(y, v2, "o")        # input 1 -> a separate sink
    with pytest.raises(NodeError) as ei:
        ex.run(g2, taps={(s2, "g")})
    assert "does not depend" in str(ei.value)


def test_bad_wrt_index_raises(ex):
    x = np.ones((2, 2), np.float32)
    g, s = chain_graph(x, {"target": "sum", "wrt": "5"})
    with pytest.raises(NodeError) as ei:
        ex.run(g, taps={(s, "g")})
    assert "wrt=5" in str(ei.value)


def test_bad_params_attributed(ex):
    x = np.ones((2, 2), np.float32)
    g, s = chain_graph(x, {"target": "blorp"})
    with pytest.raises(NodeError):
        ex.run(g, taps={(s, "g")})


def test_eager_path_evaluates_saliency(ex):
    # the debug paths rebuild the ancestor cone standalone (shared
    # _grad_specs) — run_eager's values must match the staged program's
    x = np.linspace(0.0, 1.0, 4, dtype=np.float32)
    g, s = chain_graph(x, {"target": "sum"})
    outputs, errors = ex.run_eager(g)
    assert errors == {}
    np.testing.assert_allclose(
        outputs[0]["o"], np.cos(2.0 * x + 0.5), atol=1e-6)
    staged = ex.run(g, taps={(s, "g"), (s, "o")})
    np.testing.assert_allclose(outputs[s]["g"], staged[s]["g"], atol=1e-6)
    np.testing.assert_allclose(outputs[s]["o"], staged[s]["o"], atol=1e-6)


def test_timed_eager_times_saliency(ex):
    x = np.linspace(0.0, 1.0, 4, dtype=np.float32)
    g, s = chain_graph(x, {"target": "sum"})
    timings, shapes, errors = ex.run_timed_eager(g)
    assert errors == {}
    assert s in timings and timings[s] >= 0.0
    assert shapes[s]["g"] == [4]


def test_eager_path_isolates_bad_saliency(ex):
    # a genuinely failing saliency (bad params) stays isolated: the rest
    # of the graph still evaluates
    x = np.linspace(0.0, 1.0, 4, dtype=np.float32)
    g, s = chain_graph(x, {"target": "blorp"})
    outputs, errors = ex.run_eager(g)
    assert s in errors and "target" in errors[s]
    np.testing.assert_allclose(
        outputs[0]["o"], np.cos(2.0 * x + 0.5), atol=1e-6)


def test_stacked_batches_distinct_classes(ex):
    # two concurrent sessions scrubbing different classes share one
    # vmapped program (class is a dynamic capture row)
    x = np.linspace(0.1, 2.0, 8, dtype=np.float32).reshape(2, 4)

    def mk(cls):
        g, s = chain_graph(x, {"target": "class", "class": cls},
                           mid=("cos", {"A": "1.0", "b": "0.0"}))
        return g, s

    g1, s1 = mk("0")
    g2, _ = mk("3")
    res = ex.run_stacked([g1, g2], taps={(s1, "g")})
    for res_i, cls in ((res[0], 0), (res[1], 3)):
        expect = np.zeros_like(x)
        expect[:, cls] = -np.sin(x[:, cls])
        np.testing.assert_allclose(res_i[s1]["g"], expect, atol=1e-5)


def test_saliency_through_vit_blocks(reg):
    # the real product shape: image -> embed -> block -> head -> saliency,
    # gradient lands back on the image with its shape
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    cfg = vit.ViTConfig("vit_sal", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)
    vit.VARIANTS["vit_sal"] = cfg
    try:
        make_vit_model("vit_sal").register(reg)
    finally:
        del vit.VARIANTS["vit_sal"]
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_sal:embed")
    b0 = g.add_node("vit_sal:blocks.0")
    b1 = g.add_node("vit_sal:blocks.1")
    head = g.add_node("vit_sal:head")
    s = g.add_node("saliency", {"target": "max"}).index
    g.connect(emb, "o", b0, "o")
    g.connect(b0, "o", b1, "o")
    g.connect(b1, "o", head, "o")
    g.connect(head, "o", g.nodes[s], "o")
    img = np.random.default_rng(0).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(img, emb, "o")
    out = ex.run(g, taps={(s, "o"), (s, "g"), (head.index, "o")})
    assert out[s]["g"].shape == img.shape
    assert out[s]["o"].shape == img.shape
    assert np.isfinite(out[s]["g"]).all()
    assert float(np.abs(out[s]["g"]).max()) > 0.0
    assert out[s]["o"].max() == pytest.approx(1.0, abs=1e-4)


def test_node_wrt_analytic(ex):
    # x -> cos -> cos -> saliency wrt the FIRST cos's output y:
    # d sum(cos(y)) / dy = -sin(y), y = cos(x)
    x = np.linspace(-1.0, 1.0, 6, dtype=np.float32)
    g = Graph()
    c0 = g.add_node("cos", {"A": "1.0", "b": "0.0"})
    c1 = g.add_node("cos", {"A": "1.0", "b": "0.0"})
    s = g.add_node("saliency", {"target": "sum", "wrt": "node:0"}).index
    g.connect(c0, "o", c1, "o")
    g.connect(c1, "o", g.nodes[s], "o")
    g.add_input(x, c0, "o")
    out = ex.run(g, taps={(s, "g")})
    np.testing.assert_allclose(out[s]["g"], -np.sin(np.cos(x)), atol=1e-5)
    # eager debug path agrees
    outputs, errors = ex.run_eager(g)
    assert errors == {}
    np.testing.assert_allclose(outputs[s]["g"], out[s]["g"], atol=1e-6)


def test_node_wrt_not_upstream_raises(ex):
    x = np.ones((4,), np.float32)
    g = Graph()
    c0 = g.add_node("cos", {})
    c1 = g.add_node("cos", {})  # parallel branch, NOT upstream of c0
    s = g.add_node("saliency", {"target": "sum", "wrt": "node:1"}).index
    g.connect(c0, "o", g.nodes[s], "o")
    g.add_input(x, c0, "o")
    g.add_input(x, c1, "o")
    with pytest.raises(NodeError) as ei:
        ex.run(g, taps={(s, "g")})
    assert "does not depend" in str(ei.value)


def test_gradcam_token_render(reg):
    # the Grad-CAM product shape: class logit wrt block-0's token stream,
    # rendered as a patch-grid heatmap (ReLU'd, per-sample normalized)
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    cfg = vit.ViTConfig("vit_cam", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)
    vit.VARIANTS["vit_cam"] = cfg
    try:
        make_vit_model("vit_cam").register(reg)
    finally:
        del vit.VARIANTS["vit_cam"]
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_cam:embed")
    b0 = g.add_node("vit_cam:blocks.0")
    b1 = g.add_node("vit_cam:blocks.1")
    head = g.add_node("vit_cam:head")
    s = g.add_node("saliency",
                   {"target": "max", "mode": "gradxinput",
                    "wrt": f"node:{b0.index}"}).index
    g.connect(emb, "o", b0, "o")
    g.connect(b0, "o", b1, "o")
    g.connect(b1, "o", head, "o")
    g.connect(head, "o", g.nodes[s], "o")
    img = np.random.default_rng(1).random((2, 3, 32, 32)).astype(np.float32)
    g.add_input(img, emb, "o")
    out = ex.run(g, taps={(s, "o"), (s, "g")})
    # raw attribution is token-shaped: [B, 5 tokens, width]
    assert out[s]["g"].shape == (2, 5, 64)
    # heatmap: [B, 3, 2, 2] patch grid in [0, 1] (L1 magnitude — the
    # signed CAM sum is ~0 by LN scale-invariance, see _token_cam)
    heat = out[s]["o"]
    assert heat.shape == (2, 3, 2, 2)
    assert heat.min() >= 0.0 and heat.max() <= 1.0 + 1e-6
    cam = np.abs(out[s]["g"][:, 1:]).sum(-1)
    cam = cam / np.maximum(cam.max(axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(heat[:, 0].reshape(2, 4), cam, atol=1e-5)


def test_smoothgrad_sigma_zero_is_vanilla(ex):
    x = np.linspace(-1.0, 1.0, 12, dtype=np.float32).reshape(3, 4)
    g1, s1 = chain_graph(x, {"target": "sum", "mode": "grad"})
    g2, s2 = chain_graph(x, {"target": "sum", "mode": "smooth",
                             "steps": "4", "sigma": "0"})
    a = ex.run(g1, taps={(s1, "g")})[s1]["g"]
    b = ex.run(g2, taps={(s2, "g")})[s2]["g"]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_smoothgrad_seed_and_sigma_dynamic(ex):
    x = np.linspace(-1.0, 1.0, 12, dtype=np.float32).reshape(3, 4)
    g, s = chain_graph(x, {"target": "sum", "mode": "smooth",
                           "steps": "4", "sigma": "0.2", "seed": "1"})
    a = ex.run(g, taps={(s, "g")})[s]["g"]
    assert not ex.last_stats.cache_hit
    # same params -> deterministic
    b = ex.run(g, taps={(s, "g")})[s]["g"]
    assert ex.last_stats.cache_hit
    np.testing.assert_allclose(a, b)
    # scrub sigma/seed: still a cache hit, different values
    g.nodes[s].params["sigma"] = "0.5"
    g.nodes[s].params["seed"] = "2"
    c = ex.run(g, taps={(s, "g")})[s]["g"]
    assert ex.last_stats.cache_hit
    assert not np.allclose(a, c)


def test_dream_linear_objective_saturates(ex):
    # maximize sum(x * w) over x in [0,1]: the optimum is x=1 where w>0,
    # x=0 where w<0 — normalized ascent with enough steps reaches the box
    rng = np.random.default_rng(4)
    x = np.full((2, 6), 0.5, np.float32)
    # |w| bounded away from 0: the normalized-ascent per-element step is
    # lr*|w_i|/||w||, so a near-zero weight saturates arbitrarily slowly
    w = (rng.choice([-1.0, 1.0], size=(2, 6))
         * rng.uniform(0.5, 1.5, size=(2, 6))).astype(np.float32)
    g = Graph()
    b = g.add_node("binop", {"op": "*"})
    d = g.add_node("dream", {"target": "sum", "steps": "64",
                             "lr": "0.3"}).index
    g.connect(b, "c", g.nodes[d], "o")
    g.add_input(x, b, "a")
    g.add_input(w, b, "b")
    out = ex.run(g, taps={(d, "o"), (d, "delta")})
    np.testing.assert_allclose(
        out[d]["o"], (w > 0).astype(np.float32), atol=1e-3)
    np.testing.assert_allclose(
        out[d]["delta"], out[d]["o"] - x, atol=1e-5)


def test_dream_lr_and_class_dynamic(ex):
    x = np.full((4,), 0.5, np.float32)
    g = Graph()
    c = g.add_node("cos", {"A": "1.0", "b": "0.0"})
    d = g.add_node("dream", {"target": "class", "class": "1",
                             "steps": "8", "lr": "0.1"}).index
    g.connect(c, "o", g.nodes[d], "o")
    g.add_input(x, c, "o")
    a = ex.run(g, taps={(d, "o")})[d]["o"]
    assert not ex.last_stats.cache_hit
    g.nodes[d].params["lr"] = "0.3"
    g.nodes[d].params["class"] = "2"
    b = ex.run(g, taps={(d, "o")})[d]["o"]
    assert ex.last_stats.cache_hit
    assert not np.allclose(a, b)


def test_dream_through_vit(reg):
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    cfg = vit.ViTConfig("vit_dream", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)
    vit.VARIANTS["vit_dream"] = cfg
    try:
        make_vit_model("vit_dream").register(reg)
    finally:
        del vit.VARIANTS["vit_dream"]
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_dream:embed")
    b0 = g.add_node("vit_dream:blocks.0")
    b1 = g.add_node("vit_dream:blocks.1")
    head = g.add_node("vit_dream:head")
    d = g.add_node("dream", {"target": "class", "class": "3",
                             "steps": "4", "lr": "0.1"}).index
    g.connect(emb, "o", b0, "o")
    g.connect(b0, "o", b1, "o")
    g.connect(b1, "o", head, "o")
    g.connect(head, "o", g.nodes[d], "o")
    img = np.random.default_rng(2).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(img, emb, "o")
    out = ex.run(g, taps={(d, "o"), (head.index, "o")})
    xo = out[d]["o"]
    assert xo.shape == img.shape
    assert np.isfinite(xo).all()
    assert xo.min() >= 0.0 and xo.max() <= 1.0  # clipped to the image box
    assert not np.allclose(xo, img)
    # the optimized image must actually score higher on the target class
    g2 = Graph()
    emb2 = g2.add_node("vit_dream:embed")
    b02 = g2.add_node("vit_dream:blocks.0")
    b12 = g2.add_node("vit_dream:blocks.1")
    head2 = g2.add_node("vit_dream:head")
    g2.connect(emb2, "o", b02, "o")
    g2.connect(b02, "o", b12, "o")
    g2.connect(b12, "o", head2, "o")
    g2.add_input(xo, emb2, "o")
    logits_opt = ex.run(g2, taps={(head2.index, "o")})[head2.index]["o"]
    logits_orig = out[head.index]["o"]
    assert logits_opt[0, 3] > logits_orig[0, 3]


def test_primary_taps_exclude_raw_gradient(ex):
    # "g" is an extra channel: the serving default ("primary") ships the
    # heatmap but not the input-sized raw attribution unless wired
    x = np.ones((2, 3, 4, 4), np.float32)
    g = Graph()
    s = g.add_node("saliency", {"target": "sum"}).index
    g.add_input(x, g.nodes[s], "o")
    out = ex.run(g, taps="primary")
    assert "o" in out[s] and "g" not in out[s]


def test_replay_uses_grad_safe_twin(ex, reg):
    # kernel-backed layers provide a differentiable XLA twin
    # (grad_safe_fn); the replay inside jax.grad must trace the TWIN,
    # never the serving fn (Pallas custom calls have no AD rule)
    from interactive_vit_tpu.models.model_plugin import JaxModel

    calls = {"fn": 0, "twin": 0}

    def layer_fn(p, ins):
        calls["fn"] += 1
        return {"o": ins["o"] * 2.0}

    def layer_twin(p, ins):
        calls["twin"] += 1
        return {"o": ins["o"] * 2.0}

    model = JaxModel("twiny", [("scale", [], layer_fn)], params={},
                     layer_params_fn=lambda p, n: None,
                     grad_layers={"scale": layer_twin})
    model.register(reg)
    g = Graph()
    m = g.add_node("twiny:scale")
    s = g.add_node("saliency", {"target": "sum"})
    g.connect(m, "o", s, "o")
    x = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    g.add_input(x, m, "o")
    out = Executor(reg).run(g, taps={(s.index, "g")})
    # d(sum(2x))/dx = 2 everywhere, computed through the twin
    np.testing.assert_allclose(out[s.index]["g"], 2.0, atol=1e-6)
    assert calls["twin"] >= 1, "gradient replay did not use the twin"
    assert calls["fn"] >= 1, "primary eval should still use fn"


def test_vit_plugin_registers_grad_twins(reg):
    # quantized vit: serving fn uses int8 dict weights; the twin must
    # exist and dequantize inline so saliency gradients are clean
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    cfg = vit.ViTConfig("vit_gsf", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=8)
    vit.VARIANTS["vit_gsf"] = cfg
    try:
        make_vit_model("vit_gsf", quantize="w8").register(reg)
        kind = reg.get_node("vit_gsf:blocks.0")
        assert kind._grad_fn_impl is not None
        g = Graph()
        emb = g.add_node("vit_gsf:embed")
        b0 = g.add_node("vit_gsf:blocks.0")
        head = g.add_node("vit_gsf:head")
        s = g.add_node("saliency", {"target": "max"})
        g.connect(emb, "o", b0, "o")
        g.connect(b0, "o", head, "o")
        g.connect(head, "o", s, "o")
        img = np.random.default_rng(0).random((1, 3, 32, 32)).astype(
            np.float32)
        g.add_input(img, emb, "o")
        out = Executor(reg).run(g, taps={(s.index, "g")})
        grad = np.asarray(out[s.index]["g"])
        assert grad.shape == img.shape
        assert np.isfinite(grad).all() and np.abs(grad).max() > 0
    finally:
        del vit.VARIANTS["vit_gsf"]


def test_eager_isolates_one_bad_grad_node_from_another(ex):
    # two saliency nodes, one misconfigured: run_eager must evaluate the
    # good one and attribute the error to the bad one only
    x = np.linspace(-1.0, 1.0, 8, dtype=np.float32)
    g = Graph()
    c = g.add_node("cos", {"A": "2.0", "b": "0.5"})
    good = g.add_node("saliency", {"target": "sum"})
    bad = g.add_node("saliency", {"target": "sum", "wrt": "5"})
    g.connect(c, "o", good, "o")
    g.connect(c, "o", bad, "o")
    g.add_input(x, c, "o")
    outs, errs = ex.run_eager(g)
    assert bad.index in errs and "wrt=5" in errs[bad.index]
    expect = -2.0 * np.sin(2.0 * x + 0.5)
    np.testing.assert_allclose(outs[good.index]["g"], expect, atol=1e-5)


def test_node_wrt_nonsquare_token_attribution_keeps_shape(ex, reg):
    # [1, N, D] with N-skip not a square grid: without the node-wrt hint
    # the render collapsed the BATCH axis as a CHW channel plane
    from interactive_vit_tpu.models.model_plugin import JaxModel

    def toks(p, ins):
        return {"o": ins["o"] * 1.5}

    def pool(p, ins):
        return {"o": ins["o"].sum(axis=(1, 2))[:, None]}

    JaxModel("txt", [("toks", [], toks), ("pool", [], pool)], params={},
             layer_params_fn=lambda p, n: None).register(reg)
    g = Graph()
    t = g.add_node("txt:toks")
    pl = g.add_node("txt:pool")
    s = g.add_node("saliency", {"target": "sum", "wrt": "node:0",
                                "mode": "grad"})
    g.connect(t, "o", pl, "o")
    g.connect(pl, "o", s, "o")
    x = np.random.default_rng(0).random((1, 7, 12)).astype(np.float32)
    g.add_input(x, t, "o")
    out = Executor(reg).run(g, taps={(s.index, "o")})
    heat = np.asarray(out[s.index]["o"])
    assert heat.shape == x.shape  # batch axis untouched
    assert 0.0 <= heat.min() and heat.max() <= 1.0 + 1e-6


def test_smoothgrad_is_per_sample(ex, reg):
    # the same image must get the same SmoothGrad heatmap regardless of
    # its batchmates (per-sample noise scale, per-sample gradients)
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.vit_plugin import make_vit_model

    cfg = vit.ViTConfig("vit_sg", img_size=32, patch=16, width=64,
                        depth=1, heads=4, num_classes=8)
    vit.VARIANTS["vit_sg"] = cfg
    try:
        make_vit_model("vit_sg").register(reg)
        rng = np.random.default_rng(4)
        img = rng.random((1, 3, 32, 32)).astype(np.float32)
        # batchmate with a WILDLY different range
        loud = (rng.random((1, 3, 32, 32)) * 50.0 - 20.0).astype(np.float32)

        def run_batch(batch):
            g = Graph()
            emb = g.add_node("vit_sg:embed")
            head = g.add_node("vit_sg:head")
            s = g.add_node("saliency", {"target": "sum", "mode": "smooth",
                                        "steps": "4", "sigma": "0.2"})
            g.connect(emb, "o", head, "o")
            g.connect(head, "o", s, "o")
            g.add_input(batch, emb, "o")
            return np.asarray(
                Executor(reg).run(g, taps={(s.index, "g")})[s.index]["g"])

        alone = run_batch(img)
        with_loud = run_batch(np.concatenate([img, loud]))
        np.testing.assert_allclose(alone[0], with_loud[0], atol=1e-4)
    finally:
        del vit.VARIANTS["vit_sg"]

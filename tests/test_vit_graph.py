"""Model-plugin tier: ViT as tappable graph nodes through the executor.

Covers the reference's killer capability (SURVEY.md §0: "every edge of a
neural network is tappable") on the ViT: per-layer node registration,
auto-generated graph JSON, staged whole-graph execution, attention-map taps,
and monolithic-vs-graph equivalence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.models.vit_plugin import make_vit_model
from interactive_vit_tpu.wire.schema import GraphLibrary, graph_from_json

CFG = vit.ViTConfig("vit_test", img_size=32, patch=16, width=64,
                    depth=2, heads=4, num_classes=10)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    params = vit.init_params(jax.random.key(0), CFG)
    vit.VARIANTS["vit_test"] = CFG  # register the test variant
    model = make_vit_model("vit_test", params=params)
    reg = Registry()
    from interactive_vit_tpu.ops.node_ops import register_builtin

    register_builtin(reg)
    lib = GraphLibrary(str(tmp_path_factory.mktemp("graphs")))
    model.register(reg, lib)
    return params, model, reg, lib


def test_node_names_registered(setup):
    _, model, reg, _ = setup
    names = model.list_node_names()
    assert names[0] == "vit_test:transform"
    assert "vit_test:blocks.0" in names
    assert names[-1] == "vit_test:head"
    for n in names:
        assert n in reg
        io = reg.get_node(n).io({})
        assert io["ins"][0] == "o"  # blocks add an optional "r" input
        assert "o" in io["outs"]
    blk_io = reg.get_node("vit_test:blocks.0").io({})
    assert "attn" in blk_io["outs"] and "r" in blk_io["outs"]
    assert blk_io["ins"] == ["o", "r"]


def test_generated_graph_json(setup):
    _, model, _, lib = setup
    assert lib.exists("vit_test.json")
    obj = lib.load("vit_test.json")
    # depth+4 layer nodes + category sink
    assert len(obj["nodes"]) == CFG.depth + 4 + 1
    assert obj["nodes"][0]["instance"]["endpoint"] == "vit_test:transform"
    assert obj["nodes"][-1]["instance"]["kind"] == "category"
    assert len(obj["edges"]) == len(obj["nodes"]) - 1


def test_graph_equals_monolithic_forward(setup):
    params, model, reg, lib = setup
    ex = Executor(reg)

    # build the chain WITHOUT transform (feed pre-sized images)
    g = Graph()
    names = [n for n in model.list_node_names() if not n.endswith(":transform")]
    nodes = [g.add_node(n) for n in names]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    x = np.random.default_rng(0).random((2, 3, 32, 32)).astype(np.float32)
    g.add_input(x, nodes[0], "o")

    out = ex.run(g, taps={(len(nodes) - 1, "o")})
    mono = vit.forward(params, jnp.asarray(x), CFG)["logits"]
    np.testing.assert_allclose(
        np.asarray(out[len(nodes) - 1]["o"]), np.asarray(mono), atol=1e-5
    )


def test_attention_tap_on_one_block(setup):
    params, model, reg, _ = setup
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_test:embed")
    b0 = g.add_node("vit_test:blocks.0")
    g.connect(emb, "o", b0, "o")
    x = np.random.default_rng(1).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(x, emb, "o")

    out = ex.run(g, taps={(1, "attn"), (1, "o")})
    n = CFG.tokens
    assert out[1]["attn"].shape == (1, CFG.heads, n, n)
    # rows are softmax distributions
    np.testing.assert_allclose(
        np.asarray(out[1]["attn"]).sum(-1), np.ones((1, CFG.heads, n)), atol=1e-5
    )
    # parity with the monolithic tap
    mono = vit.forward(params, jnp.asarray(x), CFG, want_attn=True)["attn"][0]
    np.testing.assert_allclose(np.asarray(out[1]["attn"]), np.asarray(mono), atol=1e-5)


def test_untapped_attn_not_returned(setup):
    _, model, reg, _ = setup
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_test:embed")
    b0 = g.add_node("vit_test:blocks.0")
    g.connect(emb, "o", b0, "o")
    x = np.random.default_rng(2).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(x, emb, "o")
    out = ex.run(g, taps={(1, "o")})
    assert "attn" not in out.get(1, {})


def test_saved_graph_loads_and_runs(setup):
    params, model, reg, lib = setup
    ex = Executor(reg)
    obj = lib.load("vit_test.json")
    g = graph_from_json(obj)
    # 3-D single image into transform (reference semantics: single image)
    x = np.random.default_rng(3).random((3, 64, 48)).astype(np.float32)
    g.add_input(x, g.nodes[0], "o")
    out = ex.run(g, taps="sinks")
    # head output feeds category (a sink with no outputs), so "sinks" taps
    # the head's "o" is consumed... tap explicitly instead:
    head_idx = next(
        n.index for n in g.nodes if n.name.endswith(":head")
    )
    out = ex.run(g, taps={(head_idx, "o")})
    logits = np.asarray(out[head_idx]["o"])
    assert logits.shape[-1] == CFG.num_classes
    assert np.isfinite(logits).all()


def test_transform_node_shapes(setup):
    _, model, reg, _ = setup
    ex = Executor(reg)
    g = Graph()
    t = g.add_node("vit_test:transform")
    x = np.random.default_rng(4).random((3, 100, 80)).astype(np.float32)
    g.add_input(x, t, "o")
    out = ex.run(g)
    assert out[0]["o"].shape == (3, 32, 32)


def test_rollout_channel_flows_through_chain(setup):
    """Attention rollout as a graph channel: wiring r block->block
    accumulates exactly attention_rollout of those blocks' maps
    (BASELINE config 2 in the interactive graph)."""
    from interactive_vit_tpu.ops.attention import attention_rollout

    params, model, reg, _ = setup
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_test:embed")
    b0 = g.add_node("vit_test:blocks.0")
    b1 = g.add_node("vit_test:blocks.1")
    g.connect(emb, "o", b0, "o")
    g.connect(b0, "o", b1, "o")
    g.connect(b0, "r", b1, "r")  # rollout flows along the chain
    x = np.random.default_rng(5).random((1, 3, 32, 32)).astype(np.float32)
    g.add_input(x, emb, "o")

    out = ex.run(g, taps={(2, "r")})
    got = np.asarray(out[2]["r"])

    mono = vit.forward(params, jnp.asarray(x), CFG, want_attn=True)
    expect = np.asarray(attention_rollout(list(mono["attn"][:2])))
    np.testing.assert_allclose(got, expect, atol=1e-5)
    # rows remain probability distributions
    np.testing.assert_allclose(got.sum(-1), np.ones_like(got.sum(-1)),
                               atol=1e-5)


def test_cls_trajectory_tap(setup):
    params, model, reg, _ = setup
    ex = Executor(reg)
    g = Graph()
    emb = g.add_node("vit_test:embed")
    b0 = g.add_node("vit_test:blocks.0")
    g.connect(emb, "o", b0, "o")
    x = np.random.default_rng(6).random((2, 3, 32, 32)).astype(np.float32)
    g.add_input(x, emb, "o")
    out = ex.run(g, taps={(1, "cls"), (1, "o")})
    np.testing.assert_allclose(
        np.asarray(out[1]["cls"]), np.asarray(out[1]["o"])[:, 0], atol=1e-6
    )


# -- self-supervised (DINO-style) feature-extractor variants -------------------


def test_dino_feature_head_and_demo_graph():
    """num_classes=0: head emits CLS features; the committed dino_s16 demo
    graph (PCA view + similarity heatmap + attention viewers on the
    feature extractor) evaluates end-to-end server-side."""
    import json
    import tempfile

    from interactive_vit_tpu.ops.node_ops import register_builtin

    # small stand-in with the dino contract (num_classes=0)
    cfg = vit.ViTConfig("dino_test", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=0)
    vit.VARIANTS["dino_test"] = cfg
    try:
        reg = Registry()
        register_builtin(reg)
        lib = GraphLibrary(tempfile.mkdtemp())
        model = make_vit_model("dino_test")
        model.register(reg, lib)

        # no classifier params, no category sink in the generated graph
        assert "w" not in (model.params.get("head") or {})
        obj = lib.load("dino_test.json")
        kinds = [n["instance"].get("kind") for n in obj["nodes"]]
        assert "category" not in kinds

        g = graph_from_json(obj)
        img = np.random.default_rng(0).random((3, 48, 40)).astype(np.float32)
        g.add_input(img, g.nodes[0], "o")
        head_i = len(g.nodes) - 1
        out = Executor(reg=reg).run(g, taps={(head_i, "o")})
        feats = np.asarray(out[head_i]["o"])
        assert feats.shape == (1, 64)  # [B, D] embedding, not logits

        # the real demo graph wires pca_view/patch_sim/attn_view/overlay
        # onto dino_s16; verify its structure references registered kinds
        demo = json.load(open("static/graphs/dino_s16.json"))
        eps = {n["instance"].get("endpoint") for n in demo["nodes"]
               if n["instance"]["kind"] == "net_node"}
        assert {"pca_view", "patch_sim", "dino_s16:norm",
                "dino_s16:head"} <= eps
        assert {n["instance"]["kind"] for n in demo["nodes"]} >= {
            "img_src", "img_view", "attn_view", "overlay"}
    finally:
        del vit.VARIANTS["dino_test"]


def test_dino_weights_roundtrip_skips_head():
    from interactive_vit_tpu.models import weights

    cfg = vit.ViTConfig("dino_rt", img_size=32, patch=16, width=64,
                        depth=1, heads=4, num_classes=0)
    params = vit.init_params(jax.random.key(0), cfg)
    sd = weights.to_torchvision(params, cfg)
    assert "heads.head.weight" not in sd
    back = weights.from_torchvision(sd, cfg)
    assert back["head"] == {}
    # features path survives the roundtrip
    x = np.random.default_rng(1).random((1, 3, 32, 32)).astype(np.float32)
    a = vit.forward(params, jnp.asarray(x), cfg)["logits"]
    b = vit.forward(back, jnp.asarray(x), cfg)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert a.shape == (1, 64)

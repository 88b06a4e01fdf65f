"""ConvNeXt: torch parity + the tappable node surface.

The torch oracle is built layer-for-layer against the torchvision
``convnext_*`` structure and STATE-DICT NAMING (torchvision itself is not
in this image), so ``convnext.from_torchvision`` and the forward
semantics (NHWC-internal blocks, channel LN eps=1e-6, exact GELU,
layer-scale residual, LN-then-conv downsampling, pool-then-LN head) are
pinned to the real checkpoint format. Reference contract: the generic
model explosion ``/root/reference/main/context.py:38-47``.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import convnext

# small geometry, real topology (all four stages, a downsample between
# each, >1 block in one stage so block indexing is exercised)
CFG = convnext.ConvNeXtConfig("convnext_micro", depths=(1, 2, 1, 1),
                              dims=(8, 16, 24, 32), num_classes=10,
                              img_size=32, resize_to=34)


class LayerNorm2d(nn.LayerNorm):
    """torchvision's LayerNorm2d: channel LN on NCHW."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class CNBlock(nn.Module):
    """torchvision CNBlock: identical submodule indices (block.0 dwconv,
    block.2 LN, block.3/5 Linears) and the ``layer_scale`` parameter."""

    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.ones(dim, 1, 1) * 1e-6)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class TorchConvNeXt(nn.Module):
    """torchvision-identical structure and state-dict key names
    (features.0 stem, stages at odd indices, downsamples between,
    classifier.{0,2})."""

    def __init__(self, cfg):
        super().__init__()
        dims = cfg.dims
        layers = [nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            LayerNorm2d(dims[0], eps=1e-6))]
        for s, depth in enumerate(cfg.depths):
            layers.append(nn.Sequential(
                *[CNBlock(dims[s]) for _ in range(depth)]))
            if s + 1 < len(cfg.depths):
                layers.append(nn.Sequential(
                    LayerNorm2d(dims[s], eps=1e-6),
                    nn.Conv2d(dims[s], dims[s + 1], 2, stride=2)))
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            LayerNorm2d(dims[-1], eps=1e-6), nn.Flatten(1),
            nn.Linear(dims[-1], cfg.num_classes))

    def forward(self, x):
        return self.classifier(self.avgpool(self.features(x)))


def _oracle(seed=0):
    torch.manual_seed(seed)
    model = TorchConvNeXt(CFG).eval()
    # randomize EVERY parameter (incl. LN scales and layer_scale) so a
    # transposed/missed leaf cannot hide behind identity defaults
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.2)
    return model


def test_from_torchvision_logits_parity():
    model = _oracle()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convnext.from_torchvision(sd, CFG)
    x = np.random.default_rng(1).standard_normal(
        (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    got = np.asarray(convnext.forward(params, jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_from_torchvision_missing_key():
    model = _oracle()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    del sd["features.1.0.block.3.weight"]
    with pytest.raises(KeyError, match="block.3.weight"):
        convnext.from_torchvision(sd, CFG)


def test_variant_table_and_shapes():
    assert set(convnext.VARIANTS) == {"convnext_t", "convnext_s",
                                      "convnext_b"}
    # parameter shapes come from the config; run the tiny table entry at
    # a reduced spatial size (geometry is resolution-independent)
    cfg = dataclasses.replace(convnext.VARIANTS["convnext_t"],
                              img_size=64, num_classes=10)
    params = convnext.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(np.random.default_rng(2).random((1, 3, 64, 64),
                                                    np.float32))
    logits = convnext.forward(params, x, cfg)
    assert logits.shape == (1, 10)
    assert np.isfinite(np.asarray(logits)).all()
    # unbatched [3,H,W] squeezes back out
    assert convnext.forward(params, x[0], cfg).shape == (10,)


def test_layer_params_mapping():
    params = convnext.init_params(jax.random.key(0), CFG)
    assert convnext.layer_params(params, "transform") is None
    assert convnext.layer_params(params, "stem") is params["stem"]
    assert (convnext.layer_params(params, "stages.1.1")
            is params["stages"][1][1])
    assert (convnext.layer_params(params, "downsample.2")
            is params["downs"][1])
    assert convnext.layer_params(params, "head") is params["head"]
    with pytest.raises(KeyError):
        convnext.layer_params(params, "nope")


def test_graph_chain_end_to_end():
    """The generated graph evaluates through the executor; stage taps are
    NHWC spatial features (the dense-viewer rank)."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.convnext_plugin import (
        make_convnext_model,
    )
    from interactive_vit_tpu.ops.node_ops import register_builtin
    from interactive_vit_tpu.wire.schema import graph_from_json

    reg = Registry()
    register_builtin(reg)
    model = make_convnext_model(cfg=CFG, with_categories=False)
    model.register(reg)
    g = graph_from_json(model.generate_graph_json())
    img = np.random.default_rng(3).random((1, 3, 48, 40), np.float32)
    for n in g.nodes:
        if not n.inputs and n.name.endswith(":transform"):
            g.add_input(jnp.asarray(img), n, "o")
    outs = Executor(reg).run(g, taps="all")
    shapes = {v.shape for d in outs.values() for v in d.values()}
    assert (1, 8, 8, 8) in shapes       # stem / stage-0 NHWC tap
    assert (1, 1, 1, 32) in shapes or (1, 32) in shapes  # pooled
    logits = [v for d in outs.values() for v in d.values()
              if v.shape == (1, 10)]
    assert logits and np.isfinite(np.asarray(logits[0])).all()


def test_convnext_chain_exports_aot(tmp_path):
    """The ConvNeXt graph program survives the AOT deployment round trip
    (StableHLO + captures; conv/LN/GELU all inside jax.export)."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.export import export_graph, load_artifact
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.convnext_plugin import (
        make_convnext_model,
    )
    from interactive_vit_tpu.ops.node_ops import register_builtin
    from interactive_vit_tpu.wire.schema import graph_from_json

    reg = Registry()
    register_builtin(reg)
    model = make_convnext_model(cfg=CFG, with_categories=False)
    model.register(reg)
    g = graph_from_json(model.generate_graph_json())
    img = np.random.default_rng(5).random((1, 3, 32, 32), np.float32)
    head = None
    for n in g.nodes:
        if not n.inputs and n.name.endswith(":transform"):
            g.add_input(img, n, "o")
        if n.name.endswith(":head"):
            head = n
    ex = Executor(reg)
    taps = {(head.index, "o")}
    want = ex.run(g, taps=taps)
    out_dir = str(tmp_path / "cnx_art")
    export_graph(g, out_dir, taps=taps, executor=ex)
    art = load_artifact(out_dir)
    got = art(img)
    np.testing.assert_allclose(np.asarray(got[head.index]["o"]),
                               np.asarray(want[head.index]["o"]),
                               atol=1e-5, rtol=1e-5)


def test_autoregister_dispatch():
    from interactive_vit_tpu.models.autoregister import (
        known_variants, make_model,
    )

    assert {"convnext_t", "convnext_s", "convnext_b"} <= set(
        known_variants())
    with pytest.raises(ValueError, match="plain-ViT family"):
        make_model("convnext_t@256")

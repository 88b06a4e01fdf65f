"""Resolution-flexible ViT serving: ``<variant>@<pixels>`` configs and
position-table resampling on checkpoint load.

The resample construction is timm's public ``resample_abs_pos_embed``
(prefix rows pass through, the square grid part is resampled bicubically
per side); parity is pinned against torch's own
``F.interpolate(mode="bicubic", antialias=True)`` — the exact op timm
calls — so the matmul-form resize is oracle-checked, not self-checked.
The reference has no analog (fixed-input VGG,
``/root/reference/static/models/vgg16.py:40-42``): this is a capability
of the model tier, exercised end-to-end through the executor below.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit


def test_resolve_variant_parsing():
    cfg = vit.resolve_variant("vit_t16")
    assert cfg is vit.VARIANTS["vit_t16"]

    cfg = vit.resolve_variant("vit_t16@256")
    assert cfg.img_size == 256 and cfg.width == 192
    assert cfg.name == "vit_t16@256"
    assert cfg.tokens == 16 * 16 + 1

    # native size resolves to the ORIGINAL config (stable name/caching)
    assert vit.resolve_variant("vit_t16@224") is vit.VARIANTS["vit_t16"]

    with pytest.raises(ValueError, match="multiple of the patch"):
        vit.resolve_variant("vit_t16@250")
    with pytest.raises(ValueError, match="unknown ViT variant"):
        vit.resolve_variant("nope@224")
    with pytest.raises(ValueError, match="resolution suffix"):
        vit.resolve_variant("vit_t16@24x")


def test_resolve_patch_suffix():
    cfg = vit.resolve_variant("vit_t16@p8")
    assert cfg.patch == 8 and cfg.img_size == 224 and cfg.width == 192
    assert cfg.name == "vit_t16@p8"
    assert cfg.tokens == 28 * 28 + 1

    cfg = vit.resolve_variant("vit_t16@256p32")
    assert (cfg.img_size, cfg.patch) == (256, 32)
    assert cfg.tokens == 8 * 8 + 1

    # native geometry resolves to the ORIGINAL config object
    assert vit.resolve_variant("vit_t16@224p16") is vit.VARIANTS["vit_t16"]
    assert vit.resolve_variant("vit_t16@p16") is vit.VARIANTS["vit_t16"]

    with pytest.raises(ValueError, match="multiple of the patch"):
        vit.resolve_variant("vit_t16@p10")  # 224 % 10 != 0
    with pytest.raises(ValueError, match="resolution suffix"):
        vit.resolve_variant("vit_t16@p")
    with pytest.raises(ValueError, match="resolution suffix"):
        vit.resolve_variant("vit_t16@256p")


def test_pi_resize_exactness_upsampling():
    """The FlexiViT PI-resize theorem: for p1 > p0 (full-column-rank
    resize), <resize(x), w_new> == <x, w> for EVERY patch x."""
    rng = np.random.default_rng(0)
    c, p0, p1, d = 3, 4, 8, 5
    w = rng.standard_normal((c * p0 * p0, d)).astype(np.float32)
    cfg = vit.ViTConfig("t", img_size=p1, patch=p1, width=d, depth=1,
                        heads=1)
    out = vit.adapt_patch_embed(
        {"patch_embed": {"w": jnp.asarray(w),
                         "b": jnp.zeros((d,), jnp.float32)}}, cfg)
    w_new = np.asarray(out["patch_embed"]["w"])  # [c*p1*p1, d]
    assert w_new.shape == (c * p1 * p1, d)

    from interactive_vit_tpu.ops.preprocess_mm import resize_matrix

    r = resize_matrix(p0, p1, "bilinear")
    x = rng.standard_normal((c, p0, p0)).astype(np.float32)
    x_up = np.einsum("ai,bj,cij->cab", r, r, x)  # the SAME resize op
    np.testing.assert_allclose(
        x_up.reshape(-1) @ w_new, x.reshape(-1) @ w,
        rtol=1e-4, atol=1e-5)


def test_adapt_patch_embed_identity_and_errors():
    cfg = vit.VARIANTS["vit_t16"]
    params = vit.init_params(jax.random.key(0), cfg)
    assert vit.adapt_patch_embed(params, cfg) is params
    bad = {"patch_embed": {"w": jnp.zeros((50, 8)),  # 50 != 3*p*p
                           "b": jnp.zeros((8,))}}
    with pytest.raises(ValueError, match="cannot .*infer|not 3 x p x p"):
        vit.adapt_patch_embed(bad, cfg)


def test_serve_at_new_patch_end_to_end():
    """A p8-native micro checkpoint serves at @p4 through the model
    plugin + executor: finer 8x8 grid, finite logits."""
    from unittest import mock

    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.vit_plugin import make_vit_model
    from interactive_vit_tpu.ops.node_ops import register_builtin
    from interactive_vit_tpu.wire.schema import graph_from_json

    micro = vit.ViTConfig("vit_micro", img_size=32, patch=8, width=48,
                          depth=2, heads=4, num_classes=10)
    with mock.patch.dict(vit.VARIANTS, {"vit_micro": micro}):
        params = vit.init_params(jax.random.key(1), micro)
        reg = Registry()
        register_builtin(reg)
        model = make_vit_model("vit_micro@p4", params=params,
                               with_categories=False)
        model.register(reg)
        # 4x4 -> 8x8 grid: 65 tokens; kernel rows 3*4*4
        assert model.params["pos_emb"].shape == (1, 65, 48)
        assert model.params["patch_embed"]["w"].shape == (48, 48)
        g = graph_from_json(model.generate_graph_json())
        img = np.random.default_rng(2).random((1, 3, 32, 32), np.float32)
        for n in g.nodes:
            if not n.inputs and n.name.endswith(":transform"):
                g.add_input(jnp.asarray(img), n, "o")
        outs = Executor(reg).run(g, taps="all")
        chans = [v for by_ch in outs.values() for ch, v in by_ch.items()
                 if ch == "o"]
        assert (1, 65, 48) in {tuple(v.shape) for v in chans}
        logits = [v for v in chans if v.shape == (1, 10)]
        assert logits and np.isfinite(np.asarray(logits[0])).all()


def test_family_guard():
    from interactive_vit_tpu.models.autoregister import make_model

    with pytest.raises(ValueError, match="plain-ViT family"):
        make_model("swin_t@256")
    with pytest.raises(ValueError, match="plain-ViT family"):
        make_model("vit_moe_s16@256")


def test_adapt_identity_and_errors():
    cfg = vit.VARIANTS["vit_t16"]
    params = vit.init_params(jax.random.key(0), cfg)
    assert vit.adapt_pos_embed(params, cfg) is params

    bad = dict(params)
    bad["pos_emb"] = jnp.zeros((1, 12, cfg.width))  # 11 grid rows: not square
    with pytest.raises(ValueError, match="not square"):
        vit.adapt_pos_embed(bad, vit.resolve_variant("vit_t16@256"))


@pytest.mark.parametrize("g_old,g_new,prefix", [(14, 24, 1), (14, 7, 1),
                                                (14, 16, 2)])
def test_resample_matches_torch_bicubic(g_old, g_new, prefix):
    """Grid resample == torch F.interpolate(bicubic, antialias=True), the
    op timm's resample_abs_pos_embed calls; prefix rows byte-identical."""
    d = 48
    rng = np.random.default_rng(0)
    pe = rng.standard_normal((1, prefix + g_old * g_old, d)).astype(np.float32)

    cfg = vit.ViTConfig("t", img_size=g_new * 8, patch=8, width=d, depth=1,
                        heads=4, distilled=(prefix == 2))
    out = vit.adapt_pos_embed({"pos_emb": jnp.asarray(pe)}, cfg)["pos_emb"]
    assert out.shape == (1, prefix + g_new * g_new, d)
    np.testing.assert_array_equal(np.asarray(out[:, :prefix]),
                                  pe[:, :prefix])

    grid = torch.from_numpy(pe[0, prefix:]).reshape(g_old, g_old, d)
    grid = grid.permute(2, 0, 1)[None]  # [1, D, g, g]
    ref = F.interpolate(grid, size=(g_new, g_new), mode="bicubic",
                        antialias=True)
    ref = ref[0].permute(1, 2, 0).reshape(g_new * g_new, d).numpy()
    np.testing.assert_allclose(np.asarray(out[0, prefix:]), ref,
                               atol=2e-5, rtol=1e-4)


def test_serve_at_higher_resolution_end_to_end():
    """A 32px-native checkpoint serves at 48px through the FULL model
    plugin + executor path: the registered @res model evaluates, emits
    the larger patch grid's taps, and its logits change smoothly (the
    resampled table is a reasonable init, not garbage)."""
    from unittest import mock

    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.vit_plugin import make_vit_model
    from interactive_vit_tpu.ops.node_ops import register_builtin
    from interactive_vit_tpu.wire.schema import graph_from_json

    micro = vit.ViTConfig("vit_micro", img_size=32, patch=8, width=48,
                          depth=2, heads=4, num_classes=10)
    with mock.patch.dict(vit.VARIANTS, {"vit_micro": micro}):
        params = vit.init_params(jax.random.key(1), micro)
        reg = Registry()
        register_builtin(reg)
        model = make_vit_model("vit_micro@48", params=params,
                               with_categories=False)
        model.register(reg)
        g = graph_from_json(model.generate_graph_json())

        # the @48 model's pos table was resampled 4x4 -> 6x6
        assert model.params["pos_emb"].shape == (1, 37, 48)
        img = np.random.default_rng(2).random((1, 3, 64, 64), np.float32)
        for n in g.nodes:
            if not n.inputs and n.name.endswith(":transform"):
                g.add_input(jnp.asarray(img), n, "o")
        outs = Executor(reg).run(g, taps="all")  # {idx: {ch: array}}
        chans = [v for by_ch in outs.values() for ch, v in by_ch.items()
                 if ch == "o"]
        shapes = {tuple(v.shape) for v in chans}
        assert (1, 37, 48) in shapes            # 6x6 grid + CLS
        logits = [v for v in chans if v.shape == (1, 10)]
        assert logits and np.isfinite(np.asarray(logits[0])).all()

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

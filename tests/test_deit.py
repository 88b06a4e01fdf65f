"""DeiT distilled family: CLS+DIST prefix tokens, dual averaged heads.

Parity is pinned against an INDEPENDENT torch module in timm
``deit_*_distilled`` naming (fused-qkv Linear, Conv2d patch embed, exact
GELU), run through torch itself — so ``weights.from_timm``'s distilled
branch (dist_token, head_dist) and the inference contract
``(head(cls) + head_dist(dist)) / 2`` are oracle-checked, not
self-checked. Plays the reference app's role of executing the same
architecture on CPU torch (``/root/reference/main/context.py:79-88``).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.models.weights import from_timm

CFG = vit.ViTConfig("deit_micro", img_size=32, patch=8, width=48, depth=2,
                    heads=4, num_classes=10, distilled=True)


def _timm_sd(params, cfg):
    """Our pytree re-expressed in timm deit naming (numpy f32)."""
    d, p = cfg.width, cfg.patch
    sd = {
        "cls_token": np.asarray(params["cls_token"], np.float32),
        "dist_token": np.asarray(params["dist_token"], np.float32),
        "pos_embed": np.asarray(params["pos_emb"], np.float32),
        "patch_embed.proj.weight": (
            np.asarray(params["patch_embed"]["w"], np.float32)
            .T.reshape(d, cfg.in_chans, p, p)),
        "patch_embed.proj.bias": np.asarray(params["patch_embed"]["b"],
                                            np.float32),
        "norm.weight": np.asarray(params["norm"]["s"], np.float32),
        "norm.bias": np.asarray(params["norm"]["b"], np.float32),
        "head.weight": np.asarray(params["head"]["w"], np.float32).T,
        "head.bias": np.asarray(params["head"]["b"], np.float32),
        "head_dist.weight": np.asarray(params["head_dist"]["w"],
                                       np.float32).T,
        "head_dist.bias": np.asarray(params["head_dist"]["b"], np.float32),
    }
    names = [("norm1", "ln1"), ("norm2", "ln2")]
    for i, blk in enumerate(params["blocks"]):
        pre = f"blocks.{i}."
        for tn, on in names:
            sd[pre + tn + ".weight"] = np.asarray(blk[on + "_s"], np.float32)
            sd[pre + tn + ".bias"] = np.asarray(blk[on + "_b"], np.float32)
        for tn, on in (("attn.qkv", "qkv"), ("attn.proj", "proj"),
                       ("mlp.fc1", "fc1"), ("mlp.fc2", "fc2")):
            sd[pre + tn + ".weight"] = np.asarray(blk[on + "_w"],
                                                  np.float32).T
            sd[pre + tn + ".bias"] = np.asarray(blk[on + "_b"], np.float32)
    return sd


class _TimmBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.width
        self.cfg = cfg
        self.norm1 = nn.LayerNorm(d, eps=cfg.ln_eps)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(d, 3 * d)
        self.attn.proj = nn.Linear(d, d)
        self.norm2 = nn.LayerNorm(d, eps=cfg.ln_eps)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(d, cfg.mlp_dim)
        self.mlp.fc2 = nn.Linear(cfg.mlp_dim, d)

    def forward(self, x):
        cfg = self.cfg
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, cfg.heads, d // cfg.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.softmax(
            q @ k.transpose(-2, -1) / (d // cfg.heads) ** 0.5, dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(o)
        return x + self.mlp.fc2(
            torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))


class _TimmDeiT(nn.Module):
    """timm vision_transformer.py distilled variant, independently built."""

    def __init__(self, cfg):
        super().__init__()
        d = cfg.width
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.dist_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, cfg.tokens, d))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(cfg.in_chans, d, cfg.patch,
                                          stride=cfg.patch)
        self.blocks = nn.ModuleList(
            [_TimmBlock(cfg) for _ in range(cfg.depth)])
        self.norm = nn.LayerNorm(d, eps=cfg.ln_eps)
        self.head = nn.Linear(d, cfg.num_classes)
        self.head_dist = nn.Linear(d, cfg.num_classes)

    @torch.no_grad()
    def forward(self, images):
        b = images.shape[0]
        x = self.patch_embed.proj(images).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1),
                       self.dist_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return (self.head(x[:, 0]) + self.head_dist(x[:, 1])) / 2


@pytest.fixture(scope="module")
def params():
    return jax.device_get(vit.init_params(jax.random.key(11), CFG))


def test_config_token_count():
    assert CFG.prefix_tokens == 2
    assert CFG.tokens == (32 // 8) ** 2 + 2


def test_deit_parity_vs_torch_oracle(params):
    sd = _timm_sd(params, CFG)
    tm = _TimmDeiT(CFG)
    tm.load_state_dict({k: torch.from_numpy(v.copy())
                        for k, v in sd.items()})
    tm.eval()
    x = np.random.default_rng(5).random((2, 3, 32, 32)).astype(np.float32)
    want = tm(torch.from_numpy(x)).numpy()

    got = np.asarray(vit.forward(
        from_timm(sd, CFG), jnp.asarray(x), CFG)["logits"])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_head_average_uses_both_tokens(params):
    """Zeroing the dist head halves the logits delta — i.e. the class and
    distillation heads genuinely average (not one or the other)."""
    x = np.random.default_rng(6).random((1, 3, 32, 32)).astype(np.float32)
    full = np.asarray(vit.forward(params, jnp.asarray(x), CFG)["logits"])
    p0 = dict(params)
    p0["head_dist"] = {"w": np.zeros_like(params["head_dist"]["w"]),
                       "b": np.zeros_like(params["head_dist"]["b"])}
    cls_only = np.asarray(vit.forward(p0, jnp.asarray(x), CFG)["logits"])
    # with head_dist = 0, logits = head(cls)/2; full = (head+head_dist)/2
    x_seq = vit.embed(params, jnp.asarray(x), CFG)
    for blk in params["blocks"]:
        x_seq, _, _ = vit.block(blk, x_seq, CFG)
    normed = vit.final_norm(params, x_seq, CFG)
    cls_head = np.asarray(
        normed[:, 0] @ params["head"]["w"] + params["head"]["b"])
    np.testing.assert_allclose(cls_only, cls_head / 2, atol=1e-5)
    assert not np.allclose(full, cls_only)


def test_deit_graph_chain_end_to_end(params):
    """The registered deit chain evaluates through the executor with an
    attention tap of the right (grid+2)-token geometry, and the chain
    logits equal the monolithic forward."""
    from interactive_vit_tpu.graph.ir import Graph
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.models.model_plugin import JaxModel

    vit.VARIANTS["deit_micro"] = CFG
    try:
        reg = Registry()
        from interactive_vit_tpu.models.vit_plugin import make_vit_model

        model = make_vit_model("deit_micro", params=params)
        model.register(reg, None)
        assert isinstance(model, JaxModel)

        g = Graph()
        chain = ["embed", "blocks.0", "blocks.1", "norm", "head"]
        nodes = [g.add_node(f"deit_micro:{n}") for n in chain]
        for a, b in zip(nodes, nodes[1:]):
            g.connect(a, "o", b, "o")
        x = np.random.default_rng(7).random((3, 32, 32)).astype(np.float32)
        g.add_input(x, nodes[0], "o")

        ex = Executor(reg)
        outs = ex.run(g, taps=[(4, "o"), (1, "attn")])
        logits = outs[4]["o"]
        attn = outs[1]["attn"]
        assert attn.shape == (1, CFG.heads, CFG.tokens, CFG.tokens)
        np.testing.assert_allclose(
            np.asarray(attn.sum(-1)), 1.0, atol=1e-3)
        want = np.asarray(vit.forward(
            params, jnp.asarray(x)[None], CFG)["logits"])
        np.testing.assert_allclose(np.asarray(logits), want,
                                   atol=1e-4, rtol=1e-4)
    finally:
        del vit.VARIANTS["deit_micro"]


def test_dense_feature_nodes_skip_two_prefix_tokens(params):
    """pca_view/patch_sim consume deit block outputs with skip=2 (the
    node-param contract for the token grid: two prefix tokens)."""
    from interactive_vit_tpu.ops.node_ops import _token_grid

    x = np.random.default_rng(8).random((1, 3, 32, 32)).astype(np.float32)
    seq = vit.embed(params, jnp.asarray(x), CFG)
    toks, g = _token_grid(seq, 2)
    assert (g, toks.shape[1]) == (4, 16)
    with pytest.raises(Exception):
        _token_grid(seq, 1)  # 17 tokens is not a square grid — clear error

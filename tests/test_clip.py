"""CLIP ViT-B/32 image encoder: torch parity + embedding node path."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import clip
from interactive_vit_tpu.models.clip_plugin import make_clip_model

CFG = clip.CLIPVisionConfig(name="clip_test", img_size=64, patch=32,
                            width=64, depth=2, heads=4, embed_dim=32)


class TorchCLIPVision(nn.Module):
    """Minimal OpenAI-CLIP visual tower with OpenAI state-dict naming."""

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(nn.Module):
        def __init__(self, d, heads):
            super().__init__()
            self.ln_1 = nn.LayerNorm(d, eps=1e-5)
            self.attn = nn.MultiheadAttention(d, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(d, eps=1e-5)
            self.mlp = nn.ModuleDict(
                dict(c_fc=nn.Linear(d, 4 * d), c_proj=nn.Linear(4 * d, d))
            )
            self.gelu = TorchCLIPVision.QuickGELU()

        def forward(self, x, need_weights=False):
            h = self.ln_1(x)
            y, w = self.attn(h, h, h, need_weights=need_weights,
                             average_attn_weights=False)
            x = x + y
            x = x + self.mlp.c_proj(self.gelu(self.mlp.c_fc(self.ln_2(x))))
            return x, w

    def __init__(self, cfg):
        super().__init__()
        d = cfg.width
        self.conv1 = nn.Conv2d(3, d, cfg.patch, stride=cfg.patch, bias=False)
        self.class_embedding = nn.Parameter(torch.zeros(d))
        self.positional_embedding = nn.Parameter(torch.zeros(cfg.tokens, d))
        self.ln_pre = nn.LayerNorm(d, eps=1e-5)
        self.transformer = nn.Module()
        self.transformer.resblocks = nn.ModuleList(
            [self.Block(d, cfg.heads) for _ in range(cfg.depth)]
        )
        self.ln_post = nn.LayerNorm(d, eps=1e-5)
        self.proj = nn.Parameter(torch.zeros(d, cfg.embed_dim))

    @torch.no_grad()
    def forward(self, images, normalize=True):
        x = self.conv1(images).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        for blk in self.transformer.resblocks:
            x, _ = blk(x)
        emb = self.ln_post(x[:, 0]) @ self.proj
        if normalize:
            emb = emb / emb.norm(dim=-1, keepdim=True)
        return emb


@pytest.fixture(scope="module")
def both():
    params = clip.init_params(jax.random.key(0), CFG)
    tm = TorchCLIPVision(CFG)
    sd = {}
    d = CFG.width
    sd["conv1.weight"] = torch.from_numpy(
        np.asarray(params["patch_embed"]["w"]).T.reshape(d, 3, 32, 32).copy()
    )
    sd["class_embedding"] = torch.from_numpy(
        np.asarray(params["cls_token"]).reshape(d).copy()
    )
    sd["positional_embedding"] = torch.from_numpy(
        np.asarray(params["pos_emb"])[0].copy()
    )
    sd["ln_pre.weight"] = torch.from_numpy(np.asarray(params["ln_pre"]["s"]).copy())
    sd["ln_pre.bias"] = torch.from_numpy(np.asarray(params["ln_pre"]["b"]).copy())
    sd["ln_post.weight"] = torch.from_numpy(np.asarray(params["ln_post"]["s"]).copy())
    sd["ln_post.bias"] = torch.from_numpy(np.asarray(params["ln_post"]["b"]).copy())
    sd["proj"] = torch.from_numpy(np.asarray(params["proj"]).copy())
    for i, blk in enumerate(params["blocks"]):
        pre = f"transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = torch.from_numpy(np.asarray(blk["ln1_s"]).copy())
        sd[pre + "ln_1.bias"] = torch.from_numpy(np.asarray(blk["ln1_b"]).copy())
        sd[pre + "attn.in_proj_weight"] = torch.from_numpy(
            np.asarray(blk["qkv_w"]).T.copy()
        )
        sd[pre + "attn.in_proj_bias"] = torch.from_numpy(
            np.asarray(blk["qkv_b"]).copy()
        )
        sd[pre + "attn.out_proj.weight"] = torch.from_numpy(
            np.asarray(blk["proj_w"]).T.copy()
        )
        sd[pre + "attn.out_proj.bias"] = torch.from_numpy(
            np.asarray(blk["proj_b"]).copy()
        )
        sd[pre + "ln_2.weight"] = torch.from_numpy(np.asarray(blk["ln2_s"]).copy())
        sd[pre + "ln_2.bias"] = torch.from_numpy(np.asarray(blk["ln2_b"]).copy())
        sd[pre + "mlp.c_fc.weight"] = torch.from_numpy(
            np.asarray(blk["fc1_w"]).T.copy()
        )
        sd[pre + "mlp.c_fc.bias"] = torch.from_numpy(np.asarray(blk["fc1_b"]).copy())
        sd[pre + "mlp.c_proj.weight"] = torch.from_numpy(
            np.asarray(blk["fc2_w"]).T.copy()
        )
        sd[pre + "mlp.c_proj.bias"] = torch.from_numpy(
            np.asarray(blk["fc2_b"]).copy()
        )
    tm.load_state_dict(sd)
    tm.eval()
    return params, tm


def test_embedding_parity(both):
    params, tm = both
    x = np.random.default_rng(0).random((2, 3, 64, 64)).astype(np.float32)
    ours = clip.forward(params, jnp.asarray(x), CFG)["embedding"]
    theirs = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)
    # embeddings are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(ours), axis=-1), np.ones(2), atol=1e-5
    )


def test_from_openai_converter(both):
    params, tm = both
    sd = {"visual." + k: v.numpy() for k, v in tm.state_dict().items()}
    back = clip.from_openai(sd, CFG)
    x = np.random.default_rng(1).random((1, 3, 64, 64)).astype(np.float32)
    a = clip.forward(params, jnp.asarray(x), CFG)["embedding"]
    b = clip.forward(back, jnp.asarray(x), CFG)["embedding"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_embedding_node_path(both):
    """The embedding-extraction graph chain (config 4's node path)."""
    params, _ = both
    clipmod = make_clip_model(params=params, cfg=CFG)
    reg = Registry()
    clipmod.register(reg)

    ex = Executor(reg)
    g = Graph()
    names = [n for n in clipmod.list_node_names()
             if not n.endswith(":transform")]
    nodes = [g.add_node(n) for n in names]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    x = np.random.default_rng(2).random((1, 3, 64, 64)).astype(np.float32)
    g.add_input(x, nodes[0], "o")
    last = len(nodes) - 1
    out = ex.run(g, taps={(last, "o")})
    emb = np.asarray(out[last]["o"])
    assert emb.shape == (1, CFG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), [1.0], atol=1e-5)


def test_bicubic_resize_matrix_matches_torch_antialiased():
    """The matmul-form bicubic (Keys a=-0.5, antialiased) is EXACT vs
    torch's antialiased bicubic on downsampling — the CLIP eval case
    (photos larger than n_px). VERDICT r2 #7."""
    from interactive_vit_tpu.ops.preprocess_mm import resize_matrix

    rng = np.random.default_rng(0)
    for (h, w), out in [((50, 40), 24), ((224, 224), 64), ((97, 131), 32)]:
        x = rng.random((1, 3, h, w)).astype(np.float32)
        rh = resize_matrix(h, out, "bicubic")
        rw = resize_matrix(w, out, "bicubic")
        ours = np.einsum("sh,bchw->bcsw", rh, x)
        ours = np.einsum("bcsw,tw->bcst", ours, rw)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(out, out), mode="bicubic",
            antialias=True).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bicubic_resize_matrix_matches_pil():
    """PIL.Image BICUBIC is THE CLIP oracle (the reference transform
    operates on PIL images); per-channel float-mode PIL resize must match
    the matrix form, up- and downsampling."""
    from PIL import Image

    from interactive_vit_tpu.ops.preprocess_mm import resize_matrix

    rng = np.random.default_rng(1)
    for (h, w), (oh, ow) in [((50, 40), (24, 24)), ((16, 16), (40, 40)),
                             ((64, 48), (48, 64))]:
        x = rng.random((h, w)).astype(np.float32)
        rh = resize_matrix(h, oh, "bicubic")
        rw = resize_matrix(w, ow, "bicubic")
        ours = rh @ x @ rw.T
        ref = np.asarray(
            Image.fromarray(x, mode="F").resize((ow, oh), Image.BICUBIC))
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_clip_transform_node_is_exact_vs_torch_pipeline():
    """The served clip transform node (shorter-side bicubic resize ->
    center crop -> normalize) against an independently-composed torch
    oracle of OpenAI CLIP's framing, <=1e-4 end to end."""
    from interactive_vit_tpu.ops.preprocess_mm import preprocess_mm
    from interactive_vit_tpu.models.clip import CLIP_MEAN, CLIP_STD

    n_px = 32
    rng = np.random.default_rng(2)
    for h, w in [(48, 72), (72, 48), (55, 55)]:
        img = rng.random((1, 3, h, w)).astype(np.float32)
        ours = np.asarray(preprocess_mm(
            jnp.asarray(img), n_px, CLIP_MEAN, CLIP_STD,
            resize_to=n_px, method="bicubic"))

        t = torch.from_numpy(img)
        if h < w:
            nh, nw = n_px, max(n_px, int(round(w * n_px / h)))
        else:
            nh, nw = max(n_px, int(round(h * n_px / w))), n_px
        t = torch.nn.functional.interpolate(
            t, size=(nh, nw), mode="bicubic", antialias=True)
        top, left = (nh - n_px) // 2, (nw - n_px) // 2
        t = t[:, :, top:top + n_px, left:left + n_px]
        mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
        ref = ((t - mean) / std).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

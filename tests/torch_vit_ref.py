"""Minimal torch ViT — the CPU parity reference for the 1e-4 contract.

Hand-written to match torchvision's ``vit_b_16`` architecture and state-dict
naming exactly (pre-LN blocks, torch ``nn.MultiheadAttention``, exact GELU,
LN eps 1e-6), so that (a) ``weights.to_torchvision`` output loads directly
via ``load_state_dict`` and (b) real torchvision checkpoints would load into
both frameworks identically. Plays the role of the reference app's CPU torch
execution path (``/root/reference/main/context.py:79-88``).
"""

from collections import OrderedDict

import torch
import torch.nn as nn


class _Block(nn.Module):
    def __init__(self, d, heads, md):
        super().__init__()
        self.ln_1 = nn.LayerNorm(d, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = nn.Sequential(
            nn.Linear(d, md), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(md, d), nn.Dropout(0.0),
        )

    def forward(self, x, need_weights=False):
        h = self.ln_1(x)
        y, w = self.self_attention(
            h, h, h, need_weights=need_weights, average_attn_weights=False
        )
        x = x + y
        x = x + self.mlp(self.ln_2(x))
        return x, w


class _Encoder(nn.Module):
    def __init__(self, tokens, d, depth, heads, md):
        super().__init__()
        self.pos_embedding = nn.Parameter(torch.zeros(1, tokens, d))
        self.layers = nn.Sequential(
            OrderedDict(
                (f"encoder_layer_{i}", _Block(d, heads, md))
                for i in range(depth)
            )
        )
        self.ln = nn.LayerNorm(d, eps=1e-6)


class TorchViTRef(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, md = cfg.width, cfg.mlp_dim
        self.patch = cfg.patch
        self.conv_proj = nn.Conv2d(cfg.in_chans, d, cfg.patch, stride=cfg.patch)
        self.class_token = nn.Parameter(torch.zeros(1, 1, d))
        self.encoder = _Encoder(cfg.tokens, d, cfg.depth, cfg.heads, md)
        self.heads = nn.Sequential(OrderedDict(head=nn.Linear(d, cfg.num_classes)))

    @torch.no_grad()
    def forward(self, images, need_weights=False):
        b = images.shape[0]
        x = self.conv_proj(images)          # [B, D, gh, gw]
        x = x.flatten(2).transpose(1, 2)    # [B, N, D]
        cls = self.class_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.encoder.pos_embedding
        attns = []
        for layer in self.encoder.layers:
            x, w = layer(x, need_weights=need_weights)
            if need_weights:
                attns.append(w)
        x = self.encoder.ln(x)
        logits = self.heads.head(x[:, 0])
        if need_weights:
            return logits, torch.stack(attns)  # [L, B, H, N, N]
        return logits, None

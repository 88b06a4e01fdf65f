"""MoE-ViT plugin — the EP model family's tappable node surface.

Registers ``vit_moe_s16:<layer>`` node kinds (vit-style chain); MoE
blocks additionally expose the "experts" channel (router gate
probabilities [B, N, E]) so the UI can visualize per-patch expert
assignment — the reference's tap-anything contract
(``/root/reference/main/context.py:79-88``) extended to routing state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from interactive_vit_tpu.models import moe
from interactive_vit_tpu.models.model_plugin import JaxModel


def make_moe_model(variant: str = "vit_moe_s16",
                   params: Optional[Any] = None, seed: int = 0,
                   dtype=None, attn_impl=None,
                   with_categories: bool = True) -> JaxModel:
    import jax.numpy as jnp

    cfg = moe.VARIANTS[variant]
    if params is None:
        params = moe.init_params(jax.random.key(seed), cfg,
                                 dtype=dtype or jnp.float32)
    cats = None
    if with_categories and cfg.num_classes == 1000:
        from interactive_vit_tpu.models.labels import class_names

        cats = class_names(1000)
    descriptions = {
        "transform": f"Resize+CenterCrop({cfg.img_size})+Normalize",
        "embed": f"patchify {cfg.patch}px + cls + pos "
                 f"[B,{cfg.tokens},{cfg.width}]",
        "norm": "final LayerNorm",
        "head": f"classifier Linear({cfg.width}, {cfg.num_classes})",
        **{
            f"blocks.{i}": (
                f"MoE block d={cfg.width} h={cfg.heads} "
                f"E={cfg.n_experts} top-1 routed MLP (tap 'experts' "
                f"for per-patch assignment)"
                if cfg.is_moe(i) else
                f"dense block d={cfg.width} h={cfg.heads}")
            for i in range(cfg.depth)
        },
    }
    # differentiable twins for gradient replays: a kernel-backed
    # attn_impl (Pallas = no AD rule) cannot be re-traced inside
    # jax.grad, so saliency/dream through MoE blocks replays the plain
    # XLA layer fns (same fix class as vit/clip; CLAUDE.md conventions)
    grad_layers = None
    if attn_impl is not None:
        grad_layers = {ln: f for ln, _extra, f in moe.layer_fns(cfg)}
    return JaxModel(
        name=cfg.name,
        layers=moe.layer_fns(cfg, attn_impl=attn_impl),
        params=params,
        layer_params_fn=moe.layer_params,
        descriptions=descriptions,
        category_names=cats,
        grad_layers=grad_layers,
    )


def instances():
    """Plugin-contract entry point."""
    return [make_moe_model()]

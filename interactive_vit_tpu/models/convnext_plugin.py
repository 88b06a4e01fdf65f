"""ConvNeXt plugin — registers the tappable stage/block surface.

25 nodes for convnext_t (transform, stem, stages.{s}.{b},
downsample.{1..3}, avgpool, head) + the category sink in the generated
graph — the reference's generic model-explosion contract
(``/root/reference/main/context.py:38-47``) on the modern-conv family.
All ops are plain XLA (no Pallas custom calls), so gradient replays
(saliency/dream/Grad-CAM) differentiate the serving fns directly — no
grad twins needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from interactive_vit_tpu.models import convnext
from interactive_vit_tpu.models.model_plugin import JaxModel


def make_convnext_model(
    variant: str = "convnext_t",
    params: Optional[Any] = None,
    seed: int = 0,
    dtype=None,
    cfg: Optional[convnext.ConvNeXtConfig] = None,
    with_categories: bool = True,
) -> JaxModel:
    """Build a registerable ``JaxModel`` for a ConvNeXt variant.

    ``cfg`` overrides the variant table (tests use tiny geometries);
    ``params=None`` -> deterministic random init (zero-egress image;
    ``convnext.from_torchvision`` loads real checkpoints, also via
    serving ``--ckpt`` with auto-detected layout)."""
    import jax.numpy as jnp

    cfg = cfg or convnext.VARIANTS[variant]
    if params is None:
        params = convnext.init_params(jax.random.key(seed), cfg,
                                      dtype=dtype or jnp.float32)
    from interactive_vit_tpu.models.labels import class_names

    cats = (class_names(cfg.num_classes)
            if with_categories and cfg.num_classes == 1000 else None)
    descriptions = {
        "transform": (f"Resize({cfg.resize_to})+CenterCrop({cfg.img_size})"
                      f"+Normalize"),
        "stem": f"4x4/4 patchify conv + LN ({cfg.dims[0]} ch)",
        "avgpool": "global average pool",
        "head": f"LN + Linear({cfg.dims[-1]}, {cfg.num_classes})",
    }
    for s, depth in enumerate(cfg.depths):
        for b in range(depth):
            descriptions[f"stages.{s}.{b}"] = (
                f"CNBlock dw7x7 + MLP ({cfg.dims[s]} ch, "
                f"{cfg.stage_res(s)}x{cfg.stage_res(s)})")
        if s + 1 < len(cfg.depths):
            descriptions[f"downsample.{s + 1}"] = (
                f"LN + 2x2/2 conv ({cfg.dims[s]} -> {cfg.dims[s + 1]} ch)")
    return JaxModel(
        name=cfg.name,
        layers=convnext.layer_fns(cfg),
        params=params,
        layer_params_fn=convnext.layer_params,
        descriptions=descriptions,
        category_names=cats,
    )


def instances():
    """Plugin-contract entry point (random-init convnext_t; serving
    boots register explicitly with --ckpt weights)."""
    return [make_convnext_model()]

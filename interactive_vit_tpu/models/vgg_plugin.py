"""VGG16 plugin — registers the reference's exact 42-node surface."""

from __future__ import annotations

from typing import Any, Optional

import jax

from interactive_vit_tpu.models import vgg
from interactive_vit_tpu.models.model_plugin import JaxModel


def make_vgg16_model(params: Optional[Any] = None, seed: int = 0,
                     dtype=None, with_categories: bool = True) -> JaxModel:
    import jax.numpy as jnp

    if params is None:
        params = vgg.init_params(jax.random.key(seed),
                                 dtype=dtype or jnp.float32)
    # real ImageNet category strings, matching the reference's
    # weights.meta["categories"] (/root/reference/static/models/vgg16.py:22)
    from interactive_vit_tpu.models.labels import class_names

    cats = class_names(1000) if with_categories else None
    descriptions = {"transform": "Resize+CenterCrop(224)+Normalize",
                    "avgpool": "AdaptiveAvgPool2d((7,7))",
                    "flatten": "Flatten"}
    return JaxModel(
        name="vgg16",
        layers=vgg.layer_fns(),
        params=params,
        layer_params_fn=vgg.layer_params,
        descriptions=descriptions,
        category_names=cats,
    )


def instances():
    """Plugin-contract entry point.

    NOTE: allocates a full random-init VGG16 (~550 MB f32) — scan-time
    registration mirrors the reference (it downloaded weights at import,
    ``static/models/vgg16.py:11-14``), but the serving boot registers
    vgg16 explicitly from config with real params; only point
    ``--plugin-dirs`` here when you want the random-init model, and never
    AFTER explicit registration (Registry.register warns on replace)."""
    return [make_vgg16_model()]

"""ResNet-50 plugin — registers the 21-node tappable surface."""

from __future__ import annotations

from typing import Any, Optional

import jax

from interactive_vit_tpu.models import resnet
from interactive_vit_tpu.models.model_plugin import JaxModel


def make_resnet50_model(params: Optional[Any] = None, seed: int = 0,
                        dtype=None, with_categories: bool = True) -> JaxModel:
    import jax.numpy as jnp

    if params is None:
        params = resnet.init_params(jax.random.key(seed),
                                    dtype=dtype or jnp.float32)
    from interactive_vit_tpu.models.labels import class_names

    cats = class_names(1000) if with_categories else None
    descriptions = {
        "transform": "Resize(256)+CenterCrop(224)+Normalize",
        "conv1": "7x7/2 conv + BN + ReLU",
        "maxpool": "3x3/2 max pool",
        "avgpool": "global average pool",
        "fc": "classifier Linear(2048, 1000)",
    }
    for si, (blocks, width) in enumerate(resnet.STAGES):
        for bi in range(blocks):
            stride = 2 if (si > 0 and bi == 0) else 1
            descriptions[f"layer{si + 1}.{bi}"] = (
                f"bottleneck {width}->{width * resnet.EXPANSION}"
                + (f", stride {stride}" if stride != 1 else ""))
    return JaxModel(
        name="resnet50",
        layers=resnet.layer_fns(),
        params=params,
        layer_params_fn=resnet.layer_params,
        descriptions=descriptions,
        category_names=cats,
    )


def instances():
    """Plugin-contract entry point (random-init; serving boots register
    explicitly with --ckpt weights)."""
    return [make_resnet50_model()]

"""MAE model plugin: masked-reconstruction as interactive graph nodes.

Analog of the reference's model-plugin surface (``/root/reference/main/
context.py:38-129`` — models register as tappable node chains); the MAE
chain is deliberately short:

    <name>:transform     eval preprocessing (resize to the encoder's res)
    <name>:reconstruct   mask -> encode -> decode -> compose viewables

``reconstruct`` is the interactive demo: channel "o" is the paper's
headline figure (visible patches from the input, masked patches from the
prediction), "masked" shows what the encoder saw, "err" / "mask" are
per-patch [gh, gw] heatmaps for the dense viewers. The ``seed`` node param
is DYNAMIC (``NodeKind.dynamic_params``): scrubbing it redraws the mask
against the CACHED program — the interaction costs a capture refresh, not
a recompile. ``mask_ratio`` is static (it changes the visible-token count,
i.e. traced shapes).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import mae
from interactive_vit_tpu.models.model_plugin import JaxModel, LayerNodeKind

logger = logging.getLogger(__name__)


def _parse_ratio(params) -> Optional[float]:
    raw = (params or {}).get("mask_ratio", "")
    if not raw:
        return None
    try:
        r = float(raw)
    except ValueError:
        from interactive_vit_tpu.graph.ir import GraphError

        raise GraphError(f"mask_ratio {raw!r} is not a number")
    if not 0.0 <= r < 1.0:
        from interactive_vit_tpu.graph.ir import GraphError

        raise GraphError(f"mask_ratio {r} must be in [0, 1)")
    return r


class _ReconstructKind(LayerNodeKind):
    """Reconstruction node: dynamic ``seed`` (cache-hit scrubbing),
    static ``mask_ratio`` (shape-changing -> in the compile signature)."""

    def contents(self, params):
        import html as _html

        seed = params.get("seed", "0") or "0"
        ratio = params.get("mask_ratio", "") or ""
        return (
            f"<p>{self.get_name()}</p>"
            f"<p>{self.model.describe(self.layer_name)}</p>"
            f"<label>seed <input data-param=\"seed\" type=\"number\" "
            f"value=\"{_html.escape(seed)}\"></label> "
            f"<label>mask ratio <input data-param=\"mask_ratio\" "
            f"type=\"text\" size=\"5\" value=\"{_html.escape(ratio)}\" "
            f"placeholder=\"0.75\"></label>")

    def dynamic_params(self):
        # the seed VALUE rides as a runtime capture: redrawing the mask
        # is the interaction and must hit the cached program
        return frozenset({"seed"})

    def dynamic_capture_keys(self):
        # weights are seed-independent: a stacked batch broadcasts them
        # and vmaps only the seed (serving/batcher per-entry in_axes)
        return frozenset({"seed"})

    def captures(self, params):
        try:
            seed = int(params.get("seed", "0") or "0")
        except ValueError:
            from interactive_vit_tpu.graph.ir import GraphError

            raise GraphError(
                f"seed {params.get('seed')!r} is not an integer")
        return {
            "w": self.model.layer_params(self.layer_name),
            "seed": jnp.asarray(seed, jnp.int32),
        }


class MAEJaxModel(JaxModel):
    def _kind_cls(self, layer_name: str) -> type:
        if layer_name == "reconstruct":
            return _ReconstructKind
        return LayerNodeKind


def make_mae_model(
    variant: str = "mae_t16",
    params: Optional[Any] = None,
    seed: int = 0,
    dtype=None,
) -> JaxModel:
    """Registerable MAE demo model. ``params=None`` -> random init (the
    reconstruction is then noise — load a pretrained checkpoint from
    ``ivt-pretrain`` via ``--ckpt`` for a meaningful demo)."""
    cfg = mae.resolve_variant(variant)
    if params is None:
        params = mae.init_params(
            jax.random.key(seed), cfg, dtype=dtype or jnp.float32)
    else:
        # native-flat round trips drop empty subtrees; the encoder's
        # feature-extractor head is a known-optional empty
        params.setdefault("enc", {}).setdefault("head", {})
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                          jnp.floating)
                else x, params)

    e = cfg.enc_cfg

    def transform_fn(p, ins):
        from interactive_vit_tpu.ops.preprocess_mm import preprocess_mm

        return {"o": preprocess_mm(ins["o"], e.img_size)}

    def reconstruct_fn(caps, ins, want=frozenset(), node_params=None):
        x = ins["o"]
        if x.ndim == 3:
            x = x[None]
        key = jax.random.key(caps["seed"])
        outs = mae.reconstruct(caps["w"], x, cfg, key,
                               mask_ratio=_parse_ratio(node_params))
        return outs

    layers = [
        ("transform", [], transform_fn),
        ("reconstruct", ["masked", "err", "mask"], reconstruct_fn),
    ]

    def layer_params_fn(p, layer_name):
        return p if layer_name == "reconstruct" else {}

    return MAEJaxModel(
        cfg.name,
        layers,
        params,
        layer_params_fn,
        descriptions={
            "transform": f"resize to {e.img_size} + normalize "
                         f"(matmul-form bilinear)",
            "reconstruct": (
                f"mask {cfg.mask_ratio:.0%} of patches, reconstruct with "
                f"the MAE decoder; o = pasted reconstruction, masked = "
                f"encoder input, err/mask = per-patch heatmaps"),
        },
    )

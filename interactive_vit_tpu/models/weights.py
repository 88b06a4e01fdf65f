"""Checkpoint conversion: torchvision/timm ViT state dicts <-> our pytrees.

The reference's "weights checkpoint" story was just torchvision's pretrained
download (``/root/reference/static/models/vgg16.py:12-13``). Our equivalent:
convert a torch ViT state dict (torchvision ``vit_b_16`` naming, or timm
``vit_*_patch16_*`` naming) into the functional pytree of ``models/vit.py``.
No torch import here — callers pass a ``{name: numpy array}`` mapping, so the
framework never depends on torch (it is only used in tests as the CPU parity
reference).

Conventions recap (see ``models/vit.py``): our linear weights are
``[D_in, D_out]`` (torch stores ``[D_out, D_in]`` -> transpose); our qkv_w is
``[D, 3D]`` with columns packed q|k|v, matching torch MHA's ``in_proj_weight``
rows; patch-embed weight is the conv kernel ``[D, C, p, p]`` reshaped to
``[C*p*p, D]`` (patchify flattens (C, ph, pw) in that order).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from interactive_vit_tpu.models.vit import Params, ViTConfig


def _t(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def from_torchvision(sd: Dict[str, Any], cfg: ViTConfig,
                     dtype=jnp.float32) -> Params:
    """torchvision ``vit_b_16``-style state dict -> our pytree."""
    d = cfg.width

    def get(name):
        if name not in sd:
            raise KeyError(f"state dict missing {name!r}")
        return _t(sd[name])

    params: Params = {
        "patch_embed": {
            "w": jnp.asarray(get("conv_proj.weight").reshape(d, -1).T, dtype),
            "b": jnp.asarray(get("conv_proj.bias"), dtype),
        },
        "cls_token": jnp.asarray(get("class_token"), dtype),
        "pos_emb": jnp.asarray(get("encoder.pos_embedding"), dtype),
        "blocks": [],
        "norm": {
            "s": jnp.asarray(get("encoder.ln.weight"), dtype),
            "b": jnp.asarray(get("encoder.ln.bias"), dtype),
        },
        "head": (
            {
                "w": jnp.asarray(get("heads.head.weight").T, dtype),
                "b": jnp.asarray(get("heads.head.bias"), dtype),
            }
            if cfg.num_classes else {}
        ),
    }
    for i in range(cfg.depth):
        pre = f"encoder.layers.encoder_layer_{i}."
        params["blocks"].append(
            {
                "ln1_s": jnp.asarray(get(pre + "ln_1.weight"), dtype),
                "ln1_b": jnp.asarray(get(pre + "ln_1.bias"), dtype),
                "qkv_w": jnp.asarray(
                    get(pre + "self_attention.in_proj_weight").T, dtype
                ),
                "qkv_b": jnp.asarray(
                    get(pre + "self_attention.in_proj_bias"), dtype
                ),
                "proj_w": jnp.asarray(
                    get(pre + "self_attention.out_proj.weight").T, dtype
                ),
                "proj_b": jnp.asarray(
                    get(pre + "self_attention.out_proj.bias"), dtype
                ),
                "ln2_s": jnp.asarray(get(pre + "ln_2.weight"), dtype),
                "ln2_b": jnp.asarray(get(pre + "ln_2.bias"), dtype),
                "fc1_w": jnp.asarray(get(pre + "mlp.0.weight").T, dtype),
                "fc1_b": jnp.asarray(get(pre + "mlp.0.bias"), dtype),
                "fc2_w": jnp.asarray(get(pre + "mlp.3.weight").T, dtype),
                "fc2_b": jnp.asarray(get(pre + "mlp.3.bias"), dtype),
            }
        )
    return params


def to_torchvision(params: Params, cfg: ViTConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> torchvision-naming state dict (numpy). Inverse of
    ``from_torchvision``; used by the parity tests to seed the torch
    reference model with identical weights."""
    d, p, c = cfg.width, cfg.patch, cfg.in_chans
    sd: Dict[str, np.ndarray] = {
        "conv_proj.weight": _t(params["patch_embed"]["w"]).T.reshape(d, c, p, p),
        "conv_proj.bias": _t(params["patch_embed"]["b"]),
        "class_token": _t(params["cls_token"]),
        "encoder.pos_embedding": _t(params["pos_emb"]),
        "encoder.ln.weight": _t(params["norm"]["s"]),
        "encoder.ln.bias": _t(params["norm"]["b"]),
    }
    if "w" in (params.get("head") or {}):
        sd["heads.head.weight"] = _t(params["head"]["w"]).T
        sd["heads.head.bias"] = _t(params["head"]["b"])
    for i, blk in enumerate(params["blocks"]):
        pre = f"encoder.layers.encoder_layer_{i}."
        sd[pre + "ln_1.weight"] = _t(blk["ln1_s"])
        sd[pre + "ln_1.bias"] = _t(blk["ln1_b"])
        sd[pre + "self_attention.in_proj_weight"] = _t(blk["qkv_w"]).T
        sd[pre + "self_attention.in_proj_bias"] = _t(blk["qkv_b"])
        sd[pre + "self_attention.out_proj.weight"] = _t(blk["proj_w"]).T
        sd[pre + "self_attention.out_proj.bias"] = _t(blk["proj_b"])
        sd[pre + "ln_2.weight"] = _t(blk["ln2_s"])
        sd[pre + "ln_2.bias"] = _t(blk["ln2_b"])
        sd[pre + "mlp.0.weight"] = _t(blk["fc1_w"]).T
        sd[pre + "mlp.0.bias"] = _t(blk["fc1_b"])
        sd[pre + "mlp.3.weight"] = _t(blk["fc2_w"]).T
        sd[pre + "mlp.3.bias"] = _t(blk["fc2_b"])
    return sd


def from_timm(sd: Dict[str, Any], cfg: ViTConfig, dtype=jnp.float32) -> Params:
    """timm ``vit_*_patch*`` naming -> our pytree.

    timm packs cls_token [1,1,D], pos_embed [1,N+1,D], blocks.i.attn.qkv
    (fused already), blocks.i.mlp.fc1/fc2, patch_embed.proj (conv).
    """
    d = cfg.width

    def get(name):
        if name not in sd:
            raise KeyError(f"state dict missing {name!r}")
        return _t(sd[name])

    params: Params = {
        "patch_embed": {
            "w": jnp.asarray(get("patch_embed.proj.weight").reshape(d, -1).T, dtype),
            "b": jnp.asarray(get("patch_embed.proj.bias"), dtype),
        },
        "cls_token": jnp.asarray(get("cls_token"), dtype),
        "pos_emb": jnp.asarray(get("pos_embed"), dtype),
        "blocks": [],
        "norm": {
            "s": jnp.asarray(get("norm.weight"), dtype),
            "b": jnp.asarray(get("norm.bias"), dtype),
        },
        # DINO/self-supervised timm checkpoints ship no classifier head
        "head": (
            {
                "w": jnp.asarray(get("head.weight").T, dtype),
                "b": jnp.asarray(get("head.bias"), dtype),
            }
            if cfg.num_classes else {}
        ),
    }
    if getattr(cfg, "distilled", False):
        # DeiT distilled (timm deit_*_distilled_*): dist_token [1,1,D],
        # head_dist averaged with head at inference (models/vit.head)
        params["dist_token"] = jnp.asarray(get("dist_token"), dtype)
        if cfg.num_classes:
            params["head_dist"] = {
                "w": jnp.asarray(get("head_dist.weight").T, dtype),
                "b": jnp.asarray(get("head_dist.bias"), dtype),
            }
    if getattr(cfg, "registers", 0):
        # DINOv2-reg / timm reg models: reg_token [1,R,D], pos-free.
        # timm stores some reg checkpoints with no_embed_class=True —
        # a pos table of GRID rows only. A zero CLS row is numerically
        # identical to "class token gets no pos"; prepend it so the
        # internal convention is always [CLS-row, grid-rows].
        params["reg_tokens"] = jnp.asarray(get("reg_token"), dtype)
        pe = params["pos_emb"]
        grid = (cfg.img_size // cfg.patch) ** 2
        if pe.shape[1] == grid:
            params["pos_emb"] = jnp.concatenate(
                [jnp.zeros((1, 1, pe.shape[2]), pe.dtype), pe], axis=1)
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blk = {
            "ln1_s": jnp.asarray(get(pre + "norm1.weight"), dtype),
            "ln1_b": jnp.asarray(get(pre + "norm1.bias"), dtype),
            "qkv_w": jnp.asarray(get(pre + "attn.qkv.weight").T, dtype),
            "qkv_b": jnp.asarray(get(pre + "attn.qkv.bias"), dtype),
            "proj_w": jnp.asarray(get(pre + "attn.proj.weight").T, dtype),
            "proj_b": jnp.asarray(get(pre + "attn.proj.bias"), dtype),
            "ln2_s": jnp.asarray(get(pre + "norm2.weight"), dtype),
            "ln2_b": jnp.asarray(get(pre + "norm2.bias"), dtype),
            "fc1_w": jnp.asarray(get(pre + "mlp.fc1.weight").T, dtype),
            "fc1_b": jnp.asarray(get(pre + "mlp.fc1.bias"), dtype),
            "fc2_w": jnp.asarray(get(pre + "mlp.fc2.weight").T, dtype),
            "fc2_b": jnp.asarray(get(pre + "mlp.fc2.bias"), dtype),
        }
        if getattr(cfg, "layer_scale", 0.0):
            # DINOv2 LayerScale: timm names the gammas ls1/ls2.gamma
            blk["ls1"] = jnp.asarray(get(pre + "ls1.gamma"), dtype)
            blk["ls2"] = jnp.asarray(get(pre + "ls2.gamma"), dtype)
        params["blocks"].append(blk)
    return params


# -- native flat layout -------------------------------------------------------
# The framework's OWN safetensors naming: pytree paths joined with "/"
# ("blocks/0/qkv_w", "patch_embed/w", ...). This is what tools/train.py
# exports and what serving's --ckpt auto-detects (keys containing "/"),
# so a model trained here round-trips to serving with zero torch anywhere.


def to_native_flat(params) -> Dict[str, np.ndarray]:
    """Flatten a params pytree to {path: array} with "/"-joined keys."""
    out: Dict[str, np.ndarray] = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}" if prefix else str(i), v)
        else:
            out[prefix] = np.asarray(node)

    walk("", params)
    return out


def from_native_flat(sd: Dict[str, Any]):
    """Rebuild the pytree from "/"-joined keys (ints -> list positions).

    Inverse of ``to_native_flat`` up to empty containers: an empty dict
    leaf (a num_classes=0 ViT "head") flattens to nothing, so model
    converters re-insert their known-optional empties (see
    ``tools/convert.convert``'s native branch)."""
    root: Dict[str, Any] = {}
    for key, val in sd.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"native key conflict at {key!r}")
        node[parts[-1]] = np.asarray(val)

    def densify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            idx = sorted(node, key=int)
            if [int(k) for k in idx] != list(range(len(idx))):
                raise ValueError("native list keys are not contiguous")
            return [densify(node[k]) for k in idx]
        return {k: densify(v) for k, v in node.items()}

    return densify(root)

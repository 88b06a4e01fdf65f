"""Checkpoint conversion CLI: torch state dicts -> orbax param checkpoints.

The bridge for users switching from the reference stack (torchvision /
timm / OpenAI-CLIP weights) to this framework:

    python -m interactive_vit_tpu.tools.convert \
        --model vit_b16 --layout torchvision \
        --input vit_b_16.pth --output ckpts/vit_b16

torch is imported lazily (only this CLI needs it; the framework itself is
torch-free).
"""

from __future__ import annotations

import argparse


def load_state_dict(path: str):
    """Load a checkpoint file into {name: numpy array}.

    ``.safetensors`` files load torch-free (utils/safetensors_io — the HF
    checkpoint format); anything else goes through ``torch.load`` (lazy
    import: only this path needs torch)."""
    if path.endswith(".safetensors"):
        from interactive_vit_tpu.utils.safetensors_io import load_file

        return load_file(path)
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except RuntimeError:
        # TorchScript archive (how OpenAI distributes CLIP): torch.load
        # refuses weights_only=True on these; torch.jit.load is the
        # proper API and yields the ScriptModule whose state_dict we want
        obj = torch.jit.load(path, map_location="cpu")
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


# historical name, kept for callers
load_torch_state_dict = load_state_dict


VALID_LAYOUTS = {
    "vgg16": {"torchvision", "native"},
    "resnet50": {"torchvision", "native"},
    "swin_t": {"torchvision", "native"},
    "swin_s": {"torchvision", "native"},
    "swin_b": {"torchvision", "native"},
    "convnext_t": {"torchvision", "native"},
    "convnext_s": {"torchvision", "native"},
    "convnext_b": {"torchvision", "native"},
    "clip_b32": {"openai", "native"},
    "clip_text_b32": {"openai", "native"},
    # MAE trees exist only in our own export naming (ivt-pretrain)
    "mae_t16": {"native"},
    "mae_s16": {"native"},
    "mae_b16": {"native"},
    # every ViT variant accepts either framework naming, or our own
    "_vit": {"torchvision", "timm", "native"},
}


def _sniff_vit_layout(sd) -> str:
    """Detect the state-dict naming from key shapes.

    Our native export uses "/"-joined pytree paths; timm ViTs (incl. DINO
    releases) use ``blocks.N.`` / ``patch_embed.``; torchvision uses
    ``encoder.layers.`` / ``conv_proj``. Defaults to torchvision when no
    family's markers are present (the error surfaces in the converter
    with the full key list)."""
    keys = sd.keys()
    if any("/" in k for k in keys):
        return "native"
    if any(k.startswith(("blocks.", "patch_embed.")) for k in keys):
        return "timm"
    return "torchvision"


def convert(model: str, layout: str, sd) -> object:
    allowed = VALID_LAYOUTS.get(model, VALID_LAYOUTS["_vit"])
    if layout == "auto":
        if any("/" in k for k in sd.keys()):
            layout = "native"  # our own export naming, any model
        elif model in VALID_LAYOUTS:
            # single torch layout; native-only models (mae_*) stay native
            # so the layout check below raises the right error text
            layout = (sorted(allowed - {"native"}) or ["native"])[-1]
        else:
            layout = _sniff_vit_layout(sd)  # ViT: tv vs timm by keys
    if layout not in allowed:
        # an explicit wrong layout must error with the right hint, not
        # fall through to a mismatched converter's KeyError (or silently
        # convert with a different naming than asked)
        raise ValueError(
            f"layout {layout!r} is not valid for {model} "
            f"(expected one of {sorted(allowed)}, or 'auto')"
        )
    if layout == "native":
        from interactive_vit_tpu.models.weights import from_native_flat

        params = from_native_flat(sd)
        if (model not in ("vgg16", "clip_b32", "clip_text_b32", "resnet50")
                and not model.startswith(("swin_", "convnext_", "mae_"))):
            # (mae_* excluded: the MAE root has no head/blocks keys —
            # make_mae_model re-inserts the encoder's empty head itself)
            # ViT only — empty containers don't survive flattening:
            # restore the optional classifier head ({} = feature
            # extractor) and an (impossible in practice) depth-0 trunk
            params.setdefault("head", {})
            params.setdefault("blocks", [])
        return params
    if model == "vgg16":
        from interactive_vit_tpu.models import vgg

        return vgg.from_torchvision(sd)
    if model == "resnet50":
        from interactive_vit_tpu.models import resnet

        return resnet.from_torchvision(sd)
    if model.startswith("swin_"):
        from interactive_vit_tpu.models import swin

        return swin.from_torch(sd, swin.VARIANTS[model])
    if model.startswith("convnext_"):
        from interactive_vit_tpu.models import convnext

        return convnext.from_torchvision(sd, convnext.VARIANTS[model])
    if model == "clip_b32":
        from interactive_vit_tpu.models import clip

        return clip.from_openai(sd, clip.CLIPVisionConfig())
    if model == "clip_text_b32":
        from interactive_vit_tpu.models import clip_text

        return clip_text.from_openai(sd, clip_text.CLIPTextConfig())
    from interactive_vit_tpu.models import vit, weights

    # "@res"/"@p" targets: convert in the checkpoint's native geometry,
    # then adapt (pos-table resample + PI patch-kernel resize; identity
    # when the geometry already matches)
    cfg = vit.resolve_variant(model)
    if layout == "timm":
        params = weights.from_timm(sd, cfg)
    else:
        params = weights.from_torchvision(sd, cfg)
    return vit.adapt_checkpoint(params, cfg)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True,
                        help="vit_t16|vit_s16|vit_b16|vit_l16|clip_b32|"
                             "clip_text_b32|vgg16|resnet50|swin_*|"
                             "convnext_*")
    parser.add_argument("--layout", default="auto",
                        choices=["auto", "torchvision", "timm", "openai",
                                 "native"])
    parser.add_argument("--input", required=True,
                        help="checkpoint path (.pth via torch, or "
                             ".safetensors torch-free)")
    parser.add_argument("--output", required=True,
                        help="orbax checkpoint directory to write")
    args = parser.parse_args()

    from interactive_vit_tpu.utils.checkpoint import save_params

    sd = load_state_dict(args.input)
    params = convert(args.model, args.layout, sd)
    save_params(args.output, params)
    print(f"converted {args.input} ({args.layout}) -> {args.output}")


if __name__ == "__main__":
    main()

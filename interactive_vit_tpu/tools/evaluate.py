"""Evaluation driver: batched top-k accuracy over a dataset, on device.

    ivt-eval --variant vit_t16 --ckpt ckpts/oracle.safetensors \
        --memorize 64 --batch 32
    ivt-eval --variant vit_b16@384 --ckpt b16.safetensors \
        --data shards/val --batch 64 --mesh data=all

Completes the train -> eval -> serve loop (the reference has no training
OR evaluation tier — its only accuracy story was a pretrained download,
``/root/reference/static/models/vgg16.py:11-14``). Data comes from the
same sources ``ivt-train`` consumes: ``--data PREFIX`` npy shards (read
mmapped in file order so every sample counts exactly once — the training
loader's shuffled full batches would drop the tail), or ``--memorize N``
(the egress-free patterned oracle set). Images are consumed at model resolution by the trunk directly (the
ivt-train contract); the forward is jitted ONCE with data-sharded inputs
(pure DP over the mesh) and chunks pad by repetition, so one compiled
program serves the whole pass. Prints one JSON line:

    {"variant": ..., "n": N, "top1": ..., "top5": ..., "imgs_per_s": ...}
"""

from __future__ import annotations

import argparse
import json
import logging
import time

logger = logging.getLogger(__name__)


def make_logits_fn(variant: str):
    """(forward(params, images) -> logits, cfg-ish, init_fn) for every
    classification-capable family. Embedding models (CLIP towers, DINO
    feature extractors with ``num_classes=0``) are rejected: top-k needs
    a classifier head."""
    from interactive_vit_tpu.models import vit

    base = variant.partition("@")[0]
    if base in vit.VARIANTS:
        cfg = vit.resolve_variant(variant)
        if cfg.num_classes == 0:
            raise ValueError(
                f"{variant} is a feature extractor (num_classes=0); "
                f"top-k accuracy needs a classifier head")
        return (lambda p, x: vit.forward(p, x, cfg)["logits"],
                cfg, lambda key: vit.init_params(key, cfg))
    if "@" in variant:
        # mirror autoregister.make_model's contract before any VARIANTS
        # lookup below would KeyError on the suffixed name
        raise ValueError(
            f"{variant!r}: the @[<pixels>][p<patch>] suffix is supported "
            f"only for the plain-ViT family (vit_*/dino_*/deit_*)")
    if base.startswith("swin_"):
        from interactive_vit_tpu.models import swin

        cfg = swin.VARIANTS[variant]
        return (lambda p, x: swin.forward(p, x, cfg)["logits"],
                cfg, lambda key: swin.init_params(key, cfg))
    if base.startswith("vit_moe"):
        from interactive_vit_tpu.models import moe

        cfg = moe.VARIANTS[variant]
        return (lambda p, x: moe.forward(p, x, cfg)["logits"],
                cfg, lambda key: moe.init_params(key, cfg))
    if "_tome" in base or base.startswith("tome"):
        from interactive_vit_tpu.models import tome

        cfg = tome.VARIANTS[variant]
        return (lambda p, x: tome.forward(p, x, cfg)["logits"],
                cfg, lambda key: tome.init_params(key, cfg))
    if base.startswith("convnext_"):
        from interactive_vit_tpu.models import convnext

        cfg = convnext.VARIANTS[variant]
        return (lambda p, x: convnext.forward(p, x, cfg),
                cfg, lambda key: convnext.init_params(key, cfg))
    if base == "resnet50":
        from interactive_vit_tpu.models import resnet

        class _Cfg:
            img_size, num_classes = 224, 1000

        return (lambda p, x: resnet.forward(p, x),
                _Cfg, lambda key: resnet.init_params(key))
    if base == "vgg16":
        from interactive_vit_tpu.models import vgg

        class _Cfg:
            img_size, num_classes = 224, 1000

        # vgg.forward includes its transform (raw [0,1] images, any size)
        return (lambda p, x: vgg.forward(p, x),
                _Cfg, lambda key: vgg.init_params(key))
    raise ValueError(
        f"no evaluation path for {variant!r} (classification families: "
        f"vit/deit (@res ok), swin_*, vit_moe_*, *_tome, convnext_*, "
        f"resnet50, vgg16)")


def run_eval(infer, params, batches, batch: int, top_k: int = 5):
    """Stream (images, labels) chunks through the jitted ``infer``.

    Short final chunks pad by repeating row 0 (one compiled program —
    pjit's batch divisibility holds because ``batch`` matched training).
    Returns (n, top1_hits, topk_hits)."""
    import numpy as np

    import jax.numpy as jnp

    n = hits1 = hitsk = 0
    for images, labels in batches:
        k = len(labels)
        if k < batch:
            pad = np.repeat(images[:1], batch - k, axis=0)
            images = np.concatenate([np.asarray(images), pad])
        logits = np.asarray(infer(params, jnp.asarray(images)))[:k]
        labels = np.asarray(labels)[:k]
        order = np.argsort(-logits, axis=-1)
        hits1 += int((order[:, 0] == labels).sum())
        hitsk += int((order[:, :top_k] == labels[:, None]).any(-1).sum())
        n += k
    return n, hits1, hitsk


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="vit_t16")
    parser.add_argument("--ckpt", default=None,
                        help="orbax dir / .safetensors / .pth "
                             "(layout auto-detected; random init when "
                             "absent — a smoke run, not a measurement)")
    parser.add_argument("--ckpt-layout", default="auto")
    parser.add_argument("--data", default=None, metavar="PREFIX",
                        help="evaluate {PREFIX}_images.npy/_labels.npy "
                             "(the ivt-train shard format; mmapped, file "
                             "order, every sample once)")
    parser.add_argument("--memorize", type=int, default=0,
                        help="evaluate on the N-image patterned oracle "
                             "set (matches ivt-train --memorize)")
    parser.add_argument("--distinct-classes", type=int, default=64)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--limit", type=int, default=0,
                        help="stop after N samples (0 = the whole set)")
    parser.add_argument("--top-k", type=int, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--mesh", default="data=all",
                        help="pure-DP evaluation mesh (data=all / data=N)")
    parser.add_argument("--platform", default="default",
                        choices=["default", "cpu"])
    args = parser.parse_args(argv)
    if bool(args.data) == bool(args.memorize):
        parser.error("exactly one of --data / --memorize is required")

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from interactive_vit_tpu.parallel import mesh as mesh_lib

    from interactive_vit_tpu.models import vit

    infer_raw, cfg, init_fn = make_logits_fn(args.variant)
    if args.ckpt:
        from interactive_vit_tpu.serving.server import load_model_params

        params = load_model_params(args.variant, args.ckpt,
                                   args.ckpt_layout)
        if args.variant.partition("@")[0] in vit.VARIANTS:
            # @res/@p targets: orbax dirs and native safetensors skip
            # the converter, so adapt here (identity at native geometry)
            params = vit.adapt_checkpoint(params, cfg)
        logger.info("loaded %s weights from %s", args.variant, args.ckpt)
    else:
        params = init_fn(jax.random.key(args.seed))
        logger.warning("no --ckpt: evaluating RANDOM-INIT weights")
    if args.dtype == "bfloat16":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    axis_sizes = (None if args.mesh == "data=all" else dict(
        (k, int(v)) for k, v in
        (kv.split("=") for kv in args.mesh.split(","))))
    mesh = mesh_lib.make_mesh(axis_sizes)
    data_ax = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    if args.batch % data_ax:
        parser.error(f"--batch {args.batch} must be divisible by the "
                     f"mesh data axis ({data_ax} devices)")
    bsh = mesh_lib.batch_sharding(mesh)

    with mesh:
        # orbax restores leaves COMMITTED to their saved (single) device;
        # replicate over the eval mesh so they compose with the
        # data-sharded batch (same re-placement load_state does)
        params = jax.device_put(params, mesh_lib.replicated(mesh))
        infer = jax.jit(infer_raw, in_shardings=(None, bsh))

        def chunked(images, labels):
            for lo in range(0, len(labels), args.batch):
                yield images[lo:lo + args.batch], labels[lo:lo + args.batch]

        if args.memorize:
            from interactive_vit_tpu.tools.train import pattern_set

            images, labels = pattern_set(
                args.seed, args.memorize, cfg.img_size, cfg.num_classes,
                args.distinct_classes)
        else:
            # direct mmapped read in FILE ORDER: evaluation needs every
            # sample exactly once — the training Loader shuffles and
            # yields full batches only (it would silently drop the
            # n % batch tail)
            images = np.load(args.data + "_images.npy", mmap_mode="r")
            labels = np.load(args.data + "_labels.npy", mmap_mode="r")
            if len(labels) != len(images):
                raise SystemExit(
                    f"--data: {len(images)} images vs {len(labels)} labels")
        if args.limit:
            images, labels = images[:args.limit], labels[:args.limit]
        t0 = time.perf_counter()
        n, h1, hk = run_eval(infer, params, chunked(images, labels),
                             args.batch, args.top_k)

    wall = time.perf_counter() - t0
    print(json.dumps({
        "variant": args.variant, "n": n,
        "top1": round(h1 / max(1, n), 4),
        f"top{args.top_k}": round(hk / max(1, n), 4),
        "wall_s": round(wall, 2),
        "imgs_per_s": round(n / wall, 1),
    }))


if __name__ == "__main__":
    main()

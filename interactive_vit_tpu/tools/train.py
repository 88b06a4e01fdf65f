"""Training driver: sharded ViT training with checkpointing.

    python -m interactive_vit_tpu.tools.train \
        --variant vit_t16 --steps 100 --batch 64 \
        --mesh data=4,model=2 --output ckpts/vit_t16

Data is synthetic (deterministic class-conditional Gaussian blobs — this
environment has no dataset and no egress); the point is the full sharded
training path: DP x TP mesh, rematerialized backward, optax AdamW, orbax
checkpoints. Swap ``synthetic_batch`` for a real loader in deployment.
"""

from __future__ import annotations

import argparse
import logging
import time

logger = logging.getLogger(__name__)


def synthetic_batch(rng, batch: int, img: int, classes: int):
    import numpy as np

    labels = rng.integers(0, classes, size=(batch,))
    # class-conditional means so the loss actually has signal to learn
    means = (labels[:, None, None, None] / classes).astype(np.float32)
    images = (rng.normal(size=(batch, 3, img, img)).astype(np.float32) * 0.3
              + means)
    return images, labels


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--variant", default="vit_t16")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--mesh", default="data=all",
                        help="e.g. data=4,model=2; 'data=all' = pure DP")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-remat", action="store_true")
    parser.add_argument("--output", default=None,
                        help="orbax checkpoint dir to save at the end")
    parser.add_argument("--log-every", type=int, default=10)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import jax.numpy as jnp
    import numpy as np

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel import mesh as mesh_lib
    from interactive_vit_tpu.parallel import train as train_lib

    cfg = vit.VARIANTS[args.variant]
    if args.mesh == "data=all":
        axis_sizes = None
    else:
        axis_sizes = dict(
            (k, int(v)) for k, v in
            (kv.split("=") for kv in args.mesh.split(","))
        )
    mesh = mesh_lib.make_mesh(axis_sizes)
    logger.info("mesh: %s over %d devices",
                dict(zip(mesh.axis_names, mesh.devices.shape)),
                mesh.devices.size)

    with mesh:
        params, opt_state, step_fn, _ = train_lib.setup_sharded(
            cfg, mesh, seed=args.seed, lr=args.lr, remat=not args.no_remat
        )
        rng = np.random.default_rng(args.seed)
        t0 = time.perf_counter()
        for step in range(args.steps):
            images, labels = synthetic_batch(
                rng, args.batch, cfg.img_size, cfg.num_classes
            )
            params, opt_state, loss = step_fn(
                params, opt_state, jnp.asarray(images), jnp.asarray(labels)
            )
            if step % args.log_every == 0 or step == args.steps - 1:
                dt = time.perf_counter() - t0
                logger.info(
                    "step %4d  loss %.4f  (%.1f imgs/s)",
                    step, float(loss),
                    (step + 1) * args.batch / dt,
                )

    if args.output:
        from interactive_vit_tpu.utils.checkpoint import save_params

        save_params(args.output, params)
        logger.info("saved checkpoint to %s", args.output)


if __name__ == "__main__":
    main()

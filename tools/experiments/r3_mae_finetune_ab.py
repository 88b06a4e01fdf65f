"""Round-3: does the MAE pretrained init actually help? On-chip A/B.

Two identical supervised finetune runs of vit_t16 on the 512-image /
64-class patterned set (the same unlabeled images MAE pretrained on —
the standard SSL transfer setting): one from the MAE encoder export
(`ivt-train --init` path, `merge_pretrained`), one from scratch. Same
seed, same batches, same optimizer; eval top-1 on the full set every 10
steps. JSONL to /tmp/r3_mae_ft.jsonl.

Expects the encoder export from r3_mae_tpu.py at
/tmp/r3_mae_ckpt/mae_t16_enc.safetensors (re-run that script first if
missing).
"""

import os
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_mae_ft.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.parallel import mesh as mesh_lib  # noqa: E402
from interactive_vit_tpu.parallel import train as train_lib  # noqa: E402
from interactive_vit_tpu.tools import train as T  # noqa: E402

ENC = "/tmp/r3_mae_ckpt/mae_t16_enc.safetensors"
assert os.path.exists(ENC), "run r3_mae_tpu.py first"

STEPS = int(os.environ.get("FT_STEPS", "80"))
BATCH = 64
EVAL_EVERY = 10
cfg = vit.resolve_variant("vit_t16")
mesh = mesh_lib.make_mesh(None)
images, labels = T.pattern_set(0, 512, cfg.img_size, cfg.num_classes, 64)

with mesh:
    for arm in ("scratch", "mae_init"):
        opt = train_lib.make_optimizer(3e-4)
        params, opt_state, step_fn, infer_fn = train_lib.setup_sharded(
            cfg, mesh, seed=0, optimizer=opt, dtype=jnp.bfloat16)
        head_major = train_lib.wants_head_major(cfg, mesh)
        if arm == "mae_init":
            params, loaded, skipped = T.init_from_checkpoint(
                ENC, params, cfg, "vit_t16", head_major)
            emit(stage="init", loaded=loaded, fresh=skipped)
        rng = np.random.default_rng(0)  # identical batch stream per arm
        imgs_d = jnp.asarray(images)
        gather = jax.jit(lambda xs, i: xs[i])
        t0 = time.time()
        curve = []
        for step in range(STEPS):
            idx = rng.integers(0, len(images), size=(BATCH,)).astype(np.int32)
            batch_im = gather(imgs_d, jnp.asarray(idx))
            batch_lab = jnp.asarray(labels[idx])
            params, opt_state, loss = step_fn(
                params, opt_state, batch_im, batch_lab)
            if (step + 1) % EVAL_EVERY == 0 or step == 0:
                acc = T.evaluate(infer_fn, params, images, labels, BATCH)
                curve.append((step + 1, round(float(loss), 4),
                              round(acc, 4)))
                emit(stage="eval", arm=arm, step=step + 1,
                     loss=round(float(loss), 4), top1=round(acc, 4))
        emit(stage="arm_done", arm=arm, wall_s=round(time.time() - t0, 1),
             curve=curve)

emit(stage="done")
print("r3_mae_finetune_ab complete")

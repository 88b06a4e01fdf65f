"""Round-3: does DeiT distillation beat plain supervision? On-chip A/B.

A vit_s16 teacher memorizes the 512-image/64-class patterned set; then a
deit_t16 student trains two ways on a NOISY-LABEL variant of the set
(20% of the labels scrambled — the regime where a clean teacher should
help, mirroring DeiT's "the teacher corrects the data"): arm A plain
supervised on the noisy labels, arm B hard distillation (alpha=0.5)
against the frozen teacher. Eval = CLEAN top-1 on the full set, plus
step-time overhead of carrying the teacher forward. JSONL to
/tmp/r3_distill_ab.jsonl.
"""

import os
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_distill_ab.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.parallel import mesh as mesh_lib  # noqa: E402
from interactive_vit_tpu.parallel import train as train_lib  # noqa: E402
from interactive_vit_tpu.tools import train as T  # noqa: E402

TEACHER_STEPS = int(os.environ.get("TEACHER_STEPS", "400"))
STUDENT_STEPS = int(os.environ.get("STUDENT_STEPS", "300"))
BATCH = 64
EVAL_EVERY = 30
NOISE_FRAC = 0.2

t_cfg = vit.resolve_variant("vit_s16")
s_cfg = vit.resolve_variant("deit_t16")
mesh = mesh_lib.make_mesh(None)
images, labels = T.pattern_set(0, 512, t_cfg.img_size, t_cfg.num_classes, 64)
rng = np.random.default_rng(42)
noisy = labels.copy()
flip = rng.random(len(labels)) < NOISE_FRAC
noisy[flip] = rng.integers(0, 64, size=flip.sum())
emit(stage="data", n=len(labels), flipped=int(flip.sum()))

with mesh:
    # --- teacher: memorize the CLEAN set ---------------------------------
    tp, to, tstep, tinfer = train_lib.setup_sharded(
        t_cfg, mesh, seed=0, lr=3e-4, dtype=jnp.bfloat16)
    imgs_d = jnp.asarray(images)
    gather = jax.jit(lambda xs, i: xs[i])
    brng = np.random.default_rng(7)
    t0 = time.time()
    for step in range(TEACHER_STEPS):
        idx = brng.integers(0, len(images), size=(BATCH,)).astype(np.int32)
        tp, to, tl = tstep(tp, to, gather(imgs_d, jnp.asarray(idx)),
                           jnp.asarray(labels[idx]))
    t_acc = T.evaluate(tinfer, tp, images, labels, BATCH)
    emit(stage="teacher_done", steps=TEACHER_STEPS, top1=round(t_acc, 4),
         loss=round(float(tl), 4), wall_s=round(time.time() - t0, 1))

    # teacher params back to torch layout for make_teacher_fn (it runs the
    # plain forward); training may have gone head-major
    if train_lib.wants_head_major(t_cfg, mesh):
        tp_plain = mesh_lib.unpermute_qkv_head_major(tp, t_cfg.heads)
    else:
        tp_plain = tp

    # --- student arms -----------------------------------------------------
    for arm in ("plain", "distill"):
        if arm == "plain":
            sp, so, sstep, sinfer = train_lib.setup_sharded(
                s_cfg, mesh, seed=1, lr=3e-4, dtype=jnp.bfloat16)
        else:
            sp, so, sstep, sinfer = train_lib.setup_sharded_distill(
                s_cfg, t_cfg, tp_plain, mesh, seed=1, lr=3e-4,
                dtype=jnp.bfloat16, alpha=0.5, tau=0.0)
        brng = np.random.default_rng(0)  # identical batch stream per arm
        t0 = time.time()
        curve = []
        step_walls = []
        for step in range(STUDENT_STEPS):
            idx = brng.integers(0, len(images), size=(BATCH,)).astype(
                np.int32)
            bi = gather(imgs_d, jnp.asarray(idx))
            bl = jnp.asarray(noisy[idx])
            t1 = time.time()
            sp, so, sl = sstep(sp, so, bi, bl)
            if step >= 10:
                jax.block_until_ready(sl)
                step_walls.append(time.time() - t1)
            if (step + 1) % EVAL_EVERY == 0 or step == 0:
                acc = T.evaluate(sinfer, sp, images, labels, BATCH)
                curve.append((step + 1, round(float(sl), 4), round(acc, 4)))
                emit(stage="eval", arm=arm, step=step + 1,
                     loss=round(float(sl), 4), clean_top1=round(acc, 4))
        emit(stage="arm_done", arm=arm,
             wall_s=round(time.time() - t0, 1),
             step_ms_p50=round(float(np.median(step_walls)) * 1e3, 1),
             final_clean_top1=curve[-1][2], curve=curve)

emit(stage="done")
print("r3_distill_ab complete")

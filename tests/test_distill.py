"""DeiT knowledge-distillation training (parallel/train.py).

The reference serves pretrained weights only (torch.no_grad,
/root/reference/main/context.py:80); the distillation objective is part
of this framework's training tier — it completes the deit_* family
(serving consumes the averaged heads; this trains them, per Touvron et
al. 2021: class head on labels, distillation head on a frozen teacher).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.parallel import mesh as mesh_lib
from interactive_vit_tpu.parallel import train as train_lib

STUDENT = vit.ViTConfig("deit_tiny_test", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=8, distilled=True)
TEACHER = vit.ViTConfig("teacher_test", img_size=32, patch=16, width=96,
                        depth=2, heads=4, num_classes=8)


def _batch(seed=0, n=8):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 8, size=(n,))
    images = (rng.normal(size=(n, 3, 32, 32)).astype(np.float32) * 0.3
              + (labels[:, None, None, None] / 8).astype(np.float32))
    return jnp.asarray(images), jnp.asarray(labels)


def test_hard_distill_loss_and_agreement():
    """Loss decreases and the student's dist head converges toward the
    teacher's predictions on a fixed batch."""
    import optax

    teacher_params = vit.init_params(jax.random.key(7), TEACHER)
    params = vit.init_params(jax.random.key(0), STUDENT)
    opt = optax.adam(3e-3)
    step = train_lib.make_distill_train_step(
        STUDENT, TEACHER, teacher_params, opt)
    images, labels = _batch()
    t_pred = np.asarray(jnp.argmax(
        vit.forward(teacher_params, images, TEACHER)["logits"], axis=-1))

    def dist_agreement(p):
        _, dist = train_lib._student_logits(p, images, STUDENT)
        return float((np.asarray(jnp.argmax(dist, -1)) == t_pred).mean())

    a0 = dist_agreement(params)
    opt_state = opt.init(params)
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
    a1 = dist_agreement(params)
    assert a1 > max(a0, 0.5), (a0, a1)


def test_soft_distill_runs_and_differs_from_hard():
    import optax

    teacher_params = vit.init_params(jax.random.key(7), TEACHER)
    params = vit.init_params(jax.random.key(0), STUDENT)
    opt = optax.adam(1e-3)
    images, labels = _batch(1)
    hard = train_lib.make_distill_train_step(
        STUDENT, TEACHER, teacher_params, opt, tau=0.0)
    soft = train_lib.make_distill_train_step(
        STUDENT, TEACHER, teacher_params, opt, tau=3.0)
    _, _, lh = hard(params, opt.init(params), images, labels)
    _, _, ls = soft(params, opt.init(params), images, labels)
    assert np.isfinite(float(lh)) and np.isfinite(float(ls))
    assert abs(float(lh) - float(ls)) > 1e-6  # different objectives


def test_distill_accum_matches_full_batch():
    import optax

    teacher_params = vit.init_params(jax.random.key(7), TEACHER)
    params = vit.init_params(jax.random.key(0), STUDENT)
    opt = optax.sgd(1e-2)
    images, labels = _batch(2)
    s1 = train_lib.make_distill_train_step(
        STUDENT, TEACHER, teacher_params, opt, accum_steps=1)
    s2 = train_lib.make_distill_train_step(
        STUDENT, TEACHER, teacher_params, opt, accum_steps=4)
    p1, _, l1 = s1(params, opt.init(params), images, labels)
    p2, _, l2 = s2(params, opt.init(params), images, labels)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_distill_validation_errors():
    teacher_params = vit.init_params(jax.random.key(7), TEACHER)
    plain = dataclasses.replace(STUDENT, distilled=False)
    with pytest.raises(ValueError, match="distilled"):
        train_lib.make_distill_train_step(plain, TEACHER, teacher_params)
    big = dataclasses.replace(TEACHER, img_size=64)
    with pytest.raises(ValueError, match="resolution"):
        train_lib.make_distill_train_step(STUDENT, big, teacher_params)
    other = dataclasses.replace(TEACHER, num_classes=16)
    with pytest.raises(ValueError, match="classes"):
        train_lib.make_distill_train_step(STUDENT, other, teacher_params)


def test_distill_sharded_dp_tp():
    """The full sharded setup on the fake mesh: student TP head-major,
    teacher torch-layout, loss decreases under jit."""
    mesh = mesh_lib.make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    teacher_params = vit.init_params(jax.random.key(7), TEACHER)
    with mesh:
        params, opt_state, step_fn, infer_fn = (
            train_lib.setup_sharded_distill(
                STUDENT, TEACHER, teacher_params, mesh, seed=0, lr=3e-3))
        images, labels = _batch()
        losses = []
        for _ in range(5):
            params, opt_state, loss = step_fn(
                params, opt_state, images, labels)
            losses.append(float(loss))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]
        logits = infer_fn(params, images)
        assert logits.shape == (8, 8)


def test_distill_cli_end_to_end(tmp_path):
    """ivt-train trains a teacher, exports it, then distills a student
    from the export — the full CLI story at toy scale."""
    from interactive_vit_tpu.tools import train as cli

    vit.VARIANTS["teacher_test"] = TEACHER
    vit.VARIANTS["deit_tiny_test"] = STUDENT
    try:
        t_ckpt = str(tmp_path / "teacher.safetensors")
        cli.main(["--variant", "teacher_test", "--steps", "3",
                  "--batch", "8", "--memorize", "8",
                  "--distinct-classes", "4",
                  "--export-safetensors", t_ckpt, "--log-every", "1"])
        cli.main(["--variant", "deit_tiny_test", "--steps", "3",
                  "--batch", "8", "--memorize", "8",
                  "--distinct-classes", "4",
                  "--distill-teacher", t_ckpt,
                  "--teacher-variant", "teacher_test",
                  "--log-every", "1"])
    finally:
        del vit.VARIANTS["teacher_test"]
        del vit.VARIANTS["deit_tiny_test"]

"""Layer-wise LR decay (parallel/train.scale_by_llrd).

The BEiT/MAE finetune recipe: per-block LR multipliers decaying from the
head toward the embeddings. The reference is inference-only
(/root/reference/main/context.py:80); LLRD completes this framework's
finetune story (`ivt-train --init` + `--llrd`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.parallel import train as train_lib

CFG = vit.ViTConfig("llrd_test", img_size=32, patch=16, width=64,
                    depth=3, heads=4, num_classes=8)


def _factors_by_path(params, decay):
    fac = train_lib.llrd_factors(params, decay)
    flat = jax.tree_util.tree_flatten_with_path(fac)[0]
    return {jax.tree_util.keystr(p): float(v) for p, v in flat}


def test_vit_factor_ladder():
    params = vit.init_params(jax.random.key(0), CFG)
    d = 0.5
    f = _factors_by_path(params, d)
    # head + final norm at full LR
    assert f["['head']['w']"] == 1.0
    assert f["['norm']['s']"] == 1.0
    # block j of L=3 at d^(L-j)
    assert f["['blocks'][2]['fc1_w']"] == pytest.approx(d)
    assert f["['blocks'][1]['fc1_w']"] == pytest.approx(d ** 2)
    assert f["['blocks'][0]['fc1_w']"] == pytest.approx(d ** 3)
    # embedding tier one below the deepest block
    assert f["['pos_emb']"] == pytest.approx(d ** 4)
    assert f["['cls_token']"] == pytest.approx(d ** 4)
    assert f["['patch_embed']['w']"] == pytest.approx(d ** 4)


def test_stage_tree_factor_ladder():
    """Swin/ConvNeXt stages[s][b] flatten in depth order; merges/downs
    attach to the end of their stage."""
    from interactive_vit_tpu.models import swin

    cfg = swin.SwinConfig("swin_llrd_test", img_size=64, patch=4,
                          embed_dim=24, depths=(1, 2), heads=(2, 4),
                          window=4, num_classes=8)
    params = swin.init_params(jax.random.key(0), cfg)
    d = 0.5
    f = _factors_by_path(params, d)
    # 3 blocks total: stages[0][0] -> d^3, stages[1][0] -> d^2,
    # stages[1][1] -> d; merge[0] sits after stage 0 => between them.
    assert f["['head']['w']"] == 1.0
    assert f["['stages'][1][1]['qkv_w']"] == pytest.approx(d)
    assert f["['stages'][1][0]['qkv_w']"] == pytest.approx(d ** 2)
    assert f["['stages'][0][0]['qkv_w']"] == pytest.approx(d ** 3)
    m = f["['merges'][0]['w']"]
    assert f["['stages'][0][0]['qkv_w']"] <= m <= f["['stages'][1][0]['qkv_w']"]
    assert f["['patch_embed']['w']"] == pytest.approx(d ** 4)


def test_llrd_equals_per_layer_lr_sgd():
    """Scaling SGD updates by f is per-leaf LR f*lr exactly."""
    params = vit.init_params(jax.random.key(0), CFG)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])

    def loss(p):
        return train_lib.cross_entropy(
            vit.forward(p, images, CFG)["logits"], labels)

    grads = jax.grad(loss)(params)
    lr, d = 1e-2, 0.5
    tx = optax.chain(optax.sgd(lr), train_lib.scale_by_llrd(d))
    updates, _ = tx.update(grads, tx.init(params), params)
    fac = train_lib.llrd_factors(params, d)
    expect = jax.tree.map(lambda g, f: -lr * f * g, grads, fac)
    for a, b in zip(jax.tree.leaves(updates), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_make_optimizer_llrd_trains():
    params = vit.init_params(jax.random.key(0), CFG)
    opt = train_lib.make_optimizer(3e-3, llrd=0.75)
    step = train_lib.make_train_step(CFG, opt)
    images = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 3, 32, 32)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 8)
    opt_state = opt.init(params)
    losses = []
    for _ in range(10):
        params, opt_state, l = step(params, opt_state, images, labels)
        losses.append(float(l))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses


def test_make_optimizer_llrd_validation():
    with pytest.raises(ValueError, match="llrd"):
        train_lib.make_optimizer(1e-3, llrd=1.5)


def test_cli_llrd_flag(tmp_path):
    from interactive_vit_tpu.tools import train as cli

    vit.VARIANTS["llrd_test"] = CFG
    try:
        cli.main(["--variant", "llrd_test", "--steps", "3", "--batch", "8",
                  "--memorize", "8", "--distinct-classes", "4",
                  "--llrd", "0.75", "--log-every", "1"])
    finally:
        del vit.VARIANTS["llrd_test"]

"""Custom-VJP flash attention vs jax.grad of the XLA reference.

``ops.attention_vjp`` is the TRAIN-step fast path: flash forward + a
backward kernel that recomputes the softmax in VMEM (no [N, N] residuals
in HBM). Its contract is exact numerics vs ``jax.grad`` of
``attention_reference`` — both use f32 softmax and f32-accumulated dots,
so parity here is tight (1e-4 in f32). Kernels run in Pallas interpret
mode; the reference has no training path at all
(``/root/reference/main/context.py:79-88``).
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl

from interactive_vit_tpu.ops import attention_vjp as av
from interactive_vit_tpu.ops import flash_attention as fa
from interactive_vit_tpu.ops.attention import attention_reference


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    orig = pl.pallas_call
    interp = functools.partial(orig, interpret=True)
    # forward rides fa._rowfull_call; backward is attention_vjp's own call
    monkeypatch.setattr(fa.pl, "pallas_call", interp)
    monkeypatch.setattr(av.pl, "pallas_call", interp)


def make_qkv(b, h, n, d, seed=0, dtype=jnp.float32, extra=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.normal(size=(b, h, n, d)).astype(np.float32), dtype)
    out = tuple(mk() for _ in range(3 + extra))
    return out


def ref_loss(q, k, v, ct, n_real=None):
    out, _ = attention_reference(q, k, v, n_real=n_real)
    return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))


def ker_loss(q, k, v, ct, n_real=None):
    out = av.attention_train(q, k, v, n_real)
    return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))


@pytest.mark.parametrize("n", [64, 197])
def test_value_matches_reference(n):
    q, k, v = make_qkv(1, 2, n, 32)
    out = av.attention_train(q, k, v)
    ref, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n", [64, 197])
def test_grads_match_reference(n):
    q, k, v, ct = make_qkv(1, 2, n, 32, seed=1, extra=1)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v, ct)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v, ct)
    for name, a, b in zip("qkv", g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"d{name} mismatch at n={n}")


def test_grads_match_with_padded_keys():
    # padded-domain execution (vit.forward pad_tokens): keys beyond
    # n_real are masked; grads must match the reference's masked grads,
    # including zeros flowing to the padded key/value rows
    n, n_real = 208, 197
    q, k, v, ct = make_qkv(1, 2, n, 32, seed=2, extra=1)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v, ct, n_real)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v, ct, n_real)
    for name, a, b in zip("qkv", g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"d{name} mismatch (padded)")
    # dv for padded rows is exactly zero (no probability mass reaches them)
    assert np.abs(np.asarray(g_ker[2])[:, :, n_real:]).max() == 0.0


def test_bf16_grads_close():
    q, k, v, ct = make_qkv(1, 2, 64, 32, seed=3, dtype=jnp.bfloat16,
                           extra=1)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v, ct)
    g_ker = jax.grad(ker_loss, argnums=(0, 1, 2))(q, k, v, ct)
    for name, a, b in zip("qkv", g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2, err_msg=f"d{name} bf16 mismatch")


def test_mhsa_wrapper_fallbacks():
    q, k, v = make_qkv(1, 1, 32, 16, seed=4)
    # want_attn falls back to the reference (training never taps maps)
    out, probs = av.trainable_flash_mhsa(q, k, v, want_attn=True)
    assert probs is not None and probs.shape == (1, 1, 32, 32)
    ref, ref_p = attention_reference(q, k, v, want_attn=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # oversized N falls back too (monkeypatch the budget, keep shapes small)
    orig = av.TRAIN_MAX_N
    av.TRAIN_MAX_N = 16
    try:
        out2, p2 = av.trainable_flash_mhsa(q, k, v)
        assert p2 is None
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                                   atol=1e-5)
    finally:
        av.TRAIN_MAX_N = orig


def test_tiny_vit_train_grads_match():
    """End-to-end: one loss backward through a 2-block ViT with the
    kernel attention equals the same backward with the XLA reference."""
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel.train import loss_fn

    cfg = vit.ViTConfig("tiny", img_size=32, patch=16, width=32, depth=2,
                        heads=2, num_classes=4)
    params = vit.init_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray([1, 3])

    def loss(p, impl):
        return loss_fn(p, images, labels, cfg, attn_impl=impl)

    g_ref = jax.grad(loss)(params, None)
    g_ker = jax.grad(loss)(params, av.trainable_flash_mhsa)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten(g_ker)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def pack_head_major(q, k, v):
    """[B,H,N,Dh] x3 -> the packed head-major qkv activation [B,N,3HD]
    ([H][3][Dh] columns — what qkv_proj(head_major=True) would split)."""
    b, h, n, d = q.shape
    qkv = jnp.stack([q, k, v], axis=2)          # [B, H, 3, N, Dh]
    return qkv.transpose(0, 3, 1, 2, 4).reshape(b, n, 3 * h * d)


@pytest.mark.parametrize("n", [64, 197])
def test_packed_value_matches_reference(n):
    q, k, v = make_qkv(1, 4, n, 64, seed=6)
    out = av.attention_train_packed(pack_head_major(q, k, v))
    ref, _ = attention_reference(q, k, v)
    ref = ref.transpose(0, 2, 1, 3).reshape(out.shape)  # head-order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_packed_grads_match_reference():
    n, n_real = 208, 197
    q, k, v, ct = make_qkv(1, 2, n, 64, seed=7, extra=1)
    ct2 = ct.transpose(0, 2, 1, 3).reshape(1, n, -1)

    def packed_loss(q, k, v):
        out = av.attention_train_packed(pack_head_major(q, k, v), n_real)
        return jnp.sum(out * ct2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v, ct, n_real)
    g_ker = jax.grad(packed_loss, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ker, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"packed d{name} mismatch")


def test_packed_end_to_end_vs_torch_layout():
    """A head-major + packed-kernel train backward equals the plain
    torch-layout XLA backward, modulo the qkv column permutation."""
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel import mesh as mesh_lib
    from interactive_vit_tpu.parallel.train import loss_fn

    cfg = vit.ViTConfig("tiny128", img_size=32, patch=16, width=128,
                        depth=2, heads=2, num_classes=4)
    assert av.packed_ok(cfg.heads, cfg.width // cfg.heads, cfg.tokens)
    params = vit.init_params(jax.random.key(1), cfg)
    params_hm = mesh_lib.permute_qkv_head_major(params, cfg.heads)
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray([0, 2])

    ref_loss_v, g_ref = jax.value_and_grad(loss_fn)(
        params, images, labels, cfg)
    ker_loss_v, g_ker = jax.value_and_grad(loss_fn)(
        params_hm, images, labels, cfg,
        attn_impl=av.trainable_flash_mhsa, qkv_head_major=True)
    np.testing.assert_allclose(float(ker_loss_v), float(ref_loss_v),
                               atol=1e-5)
    # qkv grads compare in the canonical layout; everything else directly
    g_ker_canon = mesh_lib.unpermute_qkv_head_major(g_ker, cfg.heads)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_k, _ = jax.tree_util.tree_flatten(g_ker_canon)
    for a, b in zip(flat_k, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_packed_gating():
    from interactive_vit_tpu.parallel.train import wants_head_major
    from interactive_vit_tpu.models import vit

    assert av.packed_ok(12, 64, 197)
    assert not av.packed_ok(3, 64, 197)      # odd heads
    assert not av.packed_ok(12, 32, 197)     # dh != 64
    assert not av.packed_ok(12, 64, 2048)    # over the VMEM budget

    class FakeMesh:
        axis_names = ("data",)

        class devices:
            shape = (1,)
            size = 1

    # single device + packed kernel -> head-major; no kernel -> torch layout
    assert wants_head_major(vit.VARIANTS["vit_b16"], FakeMesh(),
                            av.trainable_flash_mhsa) is True
    assert wants_head_major(vit.VARIANTS["vit_b16"], FakeMesh(),
                            None) is False
    # vit_t16 has 3 heads -> packed never engages
    assert wants_head_major(vit.VARIANTS["vit_t16"], FakeMesh(),
                            av.trainable_flash_mhsa) is False


def test_dispatch_policy():
    from interactive_vit_tpu.ops.dispatch import default_train_attn_impl

    # CPU / mesh / f32 all resolve "auto" to the XLA reference
    assert default_train_attn_impl("auto", n_devices=1,
                                   dtype=jnp.bfloat16) in (
        None, av.trainable_flash_mhsa)  # None off-TPU, kernel on-TPU
    assert default_train_attn_impl("auto", n_devices=8,
                                   dtype=jnp.bfloat16) is None
    assert default_train_attn_impl("auto", n_devices=1,
                                   dtype=jnp.float32) is None
    assert default_train_attn_impl("reference") is None
    assert (default_train_attn_impl("flash_vjp")
            is av.trainable_flash_mhsa)
    with pytest.raises(ValueError):
        default_train_attn_impl("nope")


def test_auto_remat_policy():
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel.train import auto_remat

    cfgs = vit.VARIANTS
    # vit_s16 @ 128/device fits comfortably -> remat OFF (the measured
    # 1.4x win); a 4x batch of vit_l16_384 with XLA attention breaches
    assert auto_remat(cfgs["vit_s16"], 128, jnp.bfloat16,
                      flash_attn=True) is False
    assert auto_remat(cfgs["vit_l16"], 512, jnp.float32,
                      flash_attn=False) is True
    # unknown geometry (no width attr) conservatively keeps remat ON
    class Opaque:
        pass
    assert auto_remat(Opaque(), 8) is True

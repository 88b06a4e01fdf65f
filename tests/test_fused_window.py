"""Fused Swin window-attention Pallas kernel vs the jnp reference path.

All tests run the kernel in Pallas interpret mode on the CPU backend (the
repo-wide convention: kernels are developed against the jnp ground truth;
tiling/lowering is validated separately on hardware)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import swin
from interactive_vit_tpu.ops import fused_window as fw


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(
        fw.pl, "pallas_call", functools.partial(pl.pallas_call,
                                                interpret=True)
    )


# tiny geometry: 8x8 maps, window 4 -> 2x2 window grid, shift 2
CFG = swin.SwinConfig("swin_fw", img_size=32, patch=4, embed_dim=16,
                      depths=(2, 2), heads=(2, 4), window=4,
                      num_classes=10)


def _block_params(key, stage):
    params = swin.init_params(key, CFG)
    return params, params["stages"][stage][0]


@pytest.mark.parametrize("stage,shift", [(0, 0), (0, 2), (1, 0)])
def test_block_matches_reference(stage, shift):
    params, p = _block_params(jax.random.key(stage * 7 + shift), stage)
    res = CFG.stage_res(stage)
    c = CFG.stage_dim(stage)
    x = jnp.asarray(
        np.random.default_rng(stage + shift).standard_normal(
            (2, res, res, c)).astype(np.float32))
    ref, ref_probs = swin.block(p, x, CFG, stage, shift, want_attn=True)
    got, probs = swin.block(p, x, CFG, stage, shift, want_attn=True,
                            window_impl=fw.fused_window_attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=2e-5)


def test_block_no_probs():
    params, p = _block_params(jax.random.key(9), 0)
    res = CFG.stage_res(0)
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal(
            (1, res, res, CFG.embed_dim)).astype(np.float32))
    ref, _ = swin.block(p, x, CFG, 0, 2, want_attn=False)
    got, probs = swin.block(p, x, CFG, 0, 2, want_attn=False,
                            window_impl=fw.fused_window_attn)
    assert probs is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_full_forward_with_fused_windows():
    params = swin.init_params(jax.random.key(3), CFG)
    imgs = jnp.asarray(
        np.random.default_rng(3).random((2, 3, 32, 32), np.float32))
    ref = swin.forward(params, imgs, CFG, want_attn=True)
    got = swin.forward(params, imgs, CFG, want_attn=True,
                       window_impl=fw.fused_window_attn)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               np.asarray(ref["logits"]), atol=3e-5)
    for a, b in zip(got["attn"], ref["attn"]):
        assert a.shape == b.shape  # [B, nW, heads, T, T]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_exact_softmax_matches_fast():
    """The clamp-fast softmax (incl. the -100 seam mask) equals the
    max-subtract one on real score magnitudes."""
    params, p = _block_params(jax.random.key(5), 0)
    res = CFG.stage_res(0)
    x = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (1, res, res, CFG.embed_dim)).astype(np.float32))
    y = x  # skip LN: drive the branch directly
    t = CFG.window * CFG.window
    bias = swin.gather_bias(p, swin.relative_position_index(CFG.window),
                            t, CFG.heads[0])
    mask = swin.shift_attn_mask(res, CFG.window, 2)
    a_fast, p_fast = fw.fused_window_attn(
        y, p, CFG.heads[0], CFG.window, bias, mask, want_attn=True,
        fast_softmax=True)
    a_exact, p_exact = fw.fused_window_attn(
        y, p, CFG.heads[0], CFG.window, bias, mask, want_attn=True,
        fast_softmax=False)
    np.testing.assert_allclose(np.asarray(a_fast), np.asarray(a_exact),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_fast), np.asarray(p_exact),
                               atol=2e-5)


def test_fits_guard():
    assert fw.fits(56, 7, 96, 3, jnp.bfloat16)       # swin_t stage 0
    assert fw.fits(7, 7, 1024, 32, jnp.bfloat16)     # swin_b stage 3
    assert not fw.fits(56, 7, 8192, 64, jnp.bfloat16)  # absurd width


def test_training_path_stays_differentiable():
    """block_wrapper (remat training) forces the XLA trunk even when a
    window_impl is passed — Pallas custom calls have no AD rule."""
    params = swin.init_params(jax.random.key(4), CFG)
    imgs = jnp.asarray(
        np.random.default_rng(4).random((1, 3, 32, 32), np.float32))

    def loss(ps):
        out = swin.forward(ps, imgs, CFG, block_wrapper=jax.checkpoint,
                           window_impl=fw.fused_window_attn)
        return jnp.sum(out["logits"] ** 2)

    g = jax.grad(loss)(params)
    gn = jax.tree.reduce(
        lambda a, l: a + float(jnp.sum(jnp.abs(l))), g, 0.0)
    assert np.isfinite(gn) and gn > 0

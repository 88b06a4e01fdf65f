"""Fused MLP-branch kernel vs the unfused path (interpret mode)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.ops import fused_mlp as fm
from interactive_vit_tpu.ops import layers as L


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    import jax.experimental.pallas as pl

    monkeypatch.setattr(
        fm.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    # the kernel always uses tanh GELU; compare against a tanh reference
    monkeypatch.setattr(L, "gelu", lambda x: jax.nn.gelu(x, approximate=True))


CFG = vit.ViTConfig("vit_fm", img_size=32, patch=16, width=64,
                    depth=1, heads=4, num_classes=10)


def test_mlp_branch_matches_unfused():
    params = vit.init_params(jax.random.key(0), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(0).random((2, CFG.tokens, CFG.width), np.float32)
    )
    ref = x + L.mlp(L.layer_norm(x, p["ln2_s"], p["ln2_b"], CFG.ln_eps), p)
    got = fm.fused_mlp_block(x, p, CFG.ln_eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_block_with_mlp_impl():
    params = vit.init_params(jax.random.key(1), CFG)
    p = params["blocks"][0]
    x = jnp.asarray(
        np.random.default_rng(1).random((1, CFG.tokens, CFG.width), np.float32)
    )
    ref, _, _ = vit.block(p, x, CFG)
    got, _, _ = vit.block(p, x, CFG, mlp_impl=fm.fused_mlp_block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_fits_estimator():
    assert fm.fits(768, 3072, jnp.bfloat16)
    assert not fm.fits(4096, 16384, jnp.bfloat16)


def test_w8a8_mlp_matches_jnp_w8a8():
    """In-kernel quantized MLP vs the jnp W8A8 path (ops/quant.py): same
    per-token int8 semantics, so only f32 rounding + the round-half mode
    on exact .5 lattice points may differ."""
    from interactive_vit_tpu.ops import quant

    params = vit.init_params(jax.random.key(2), CFG)
    p = dict(params["blocks"][0])
    qp = dict(p)
    qp["fc1_w"] = quant.quantize_weight(p["fc1_w"], mode="w8a8")
    qp["fc2_w"] = quant.quantize_weight(p["fc2_w"], mode="w8a8")
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (2, CFG.tokens, CFG.width)).astype(np.float32)
    )
    ref = x + L.mlp(
        L.layer_norm(x, qp["ln2_s"], qp["ln2_b"], CFG.ln_eps), qp)
    got = fm.fused_mlp_w8a8_block(x, qp, CFG.ln_eps)
    # identical int8 grids except where x/scale lands exactly on .5:
    # bound the disagreement by one quantization step through fc2
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-3, atol=5e-3)


def test_w8a8_fits_estimator():
    assert fm.pick_block_q_w8a8(768, 3072) >= 256    # ViT-B
    assert fm.pick_block_q_w8a8(1024, 4096) >= 128   # ViT-L
    assert fm.pick_block_q_w8a8(4096, 16384) == 0

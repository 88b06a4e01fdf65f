"""Pallas attention kernels vs the jnp reference (interpret mode on CPU).

The kernels run compiled on TPU (bench + TPU-marked tests); here they run in
the Pallas interpreter so CI needs no chip. Contract: match
``attention_reference`` to 1e-5 in f32.
"""

import functools

import numpy as np
import pytest

import jax.numpy as jnp

from interactive_vit_tpu.ops.attention import attention_reference

# interpret=True monkeypatch: run every pallas_call in interpreter mode
import jax.experimental.pallas as pl  # noqa: E402
from interactive_vit_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        fa.pl, "pallas_call", functools.partial(orig, interpret=True)
    )


def make_qkv(b, h, n, d, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32), dtype)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32), dtype)
    return q, k, v


@pytest.mark.parametrize("n", [128, 197, 577])
def test_rowfull_matches_reference(n):
    q, k, v = make_qkv(1, 2, n, 64)
    out, probs = fa.flash_attention(q, k, v, want_attn=True)
    ref_out, ref_probs = attention_reference(q, k, v, want_attn=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(ref_probs), atol=1e-5
    )


def test_rowfull_no_probs_path():
    q, k, v = make_qkv(2, 3, 197, 64, seed=1)
    out, probs = fa.flash_attention(q, k, v, want_attn=False)
    assert probs is None
    ref_out, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_online_kernel_long_sequence():
    # force the online path by shrinking the rowfull threshold
    q, k, v = make_qkv(1, 1, 300, 64, seed=2)
    orig = fa.ROWFULL_MAX_N
    fa.ROWFULL_MAX_N = 128
    try:
        out, probs = fa.flash_attention(q, k, v, want_attn=False)
    finally:
        fa.ROWFULL_MAX_N = orig
    assert probs is None
    ref_out, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)


def test_maps_on_long_sequence_fall_back_to_reference():
    """want_attn past ROWFULL_MAX_N must NOT reach the row-resident
    kernel (its working set breaches scoped VMEM — a deterministic
    compile kill on the chip); the jnp reference serves the maps."""
    q, k, v = make_qkv(1, 1, 300, 16, seed=7)
    orig = fa.ROWFULL_MAX_N
    fa.ROWFULL_MAX_N = 128
    try:
        out, probs = fa.flash_attention(q, k, v, want_attn=True)
    finally:
        fa.ROWFULL_MAX_N = orig
    ref_out, ref_probs = attention_reference(q, k, v, want_attn=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)


def test_online_matches_rowfull_multiblock():
    # n = 256: exactly 2 q blocks and 2 k blocks
    q, k, v = make_qkv(1, 2, 256, 64, seed=3)
    out_row, _ = fa.flash_attention(q, k, v)
    orig = fa.ROWFULL_MAX_N
    fa.ROWFULL_MAX_N = 0
    try:
        out_onl, _ = fa.flash_attention(q, k, v)
    finally:
        fa.ROWFULL_MAX_N = orig
    np.testing.assert_allclose(
        np.asarray(out_onl), np.asarray(out_row), atol=1e-5
    )


def test_probs_rows_sum_to_one_with_padding():
    # n=197 pads to 256; padded key columns must carry zero probability
    q, k, v = make_qkv(1, 1, 197, 64, seed=4)
    _, probs = fa.flash_attention(q, k, v, want_attn=True)
    np.testing.assert_allclose(
        np.asarray(probs).sum(-1), np.ones((1, 1, 197)), atol=1e-5
    )


def test_mhsa_with_flash_impl_matches_reference():
    from interactive_vit_tpu.ops.attention import mhsa

    rng = np.random.default_rng(5)
    d, heads, n = 64, 4, 197
    x = jnp.asarray(rng.normal(size=(2, n, d)).astype(np.float32))
    p = {
        "qkv_w": jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1),
        "qkv_b": jnp.zeros((3 * d,), jnp.float32),
        "proj_w": jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1),
        "proj_b": jnp.zeros((d,), jnp.float32),
    }
    ref, ref_probs = mhsa(x, p, heads, want_attn=True, attn_impl=None)
    ours, probs = mhsa(x, p, heads, want_attn=True, attn_impl=fa.flash_mhsa)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs), atol=1e-5)


def test_online_trailing_rows_not_divisible_by_block_q():
    """n > ROWFULL_MAX_N with n_pad not a multiple of block_q used to
    floor the q-grid and silently skip the last partial block of real
    rows (regression: n=2049 left row 2048 uninitialized)."""
    n = fa.ROWFULL_MAX_N + 1  # 2049: pad-to-128 is NOT a 256 multiple
    q, k, v = make_qkv(1, 1, n, 8, seed=7)
    out, probs = fa.flash_attention(q, k, v, want_attn=False)
    assert probs is None
    ref, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, -260:], np.asarray(ref)[:, :, -260:],
        atol=2e-5,
    )

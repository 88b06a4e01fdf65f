"""Ring attention + Ulysses vs the single-device reference, on the 8-device
fake CPU mesh (the standard multi-chip validation pattern, SURVEY.md §4d)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from interactive_vit_tpu.ops.attention import attention_reference
from interactive_vit_tpu.parallel.sequence import ring_attention, ulysses_attention


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("seq",))


def make_qkv(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
        for _ in range(3)
    )


def test_ring_matches_reference(mesh):
    q, k, v = make_qkv(2, 4, 64, 16)
    out = ring_attention(q, k, v, mesh, axis="seq")
    ref, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_with_padded_tail(mesh):
    # n_real=57, padded to 64 (8 shards of 8): padded keys carry no weight
    q, k, v = make_qkv(1, 2, 64, 16, seed=1)
    out = ring_attention(q, k, v, mesh, axis="seq", n_real=57)
    ref, _ = attention_reference(q, k, v, n_real=57)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :57], np.asarray(ref)[:, :, :57], atol=1e-5
    )


def test_ulysses_matches_reference(mesh):
    q, k, v = make_qkv(2, 8, 64, 16, seed=2)  # heads divisible by 8
    out, _ = ulysses_attention(q, k, v, mesh, axis="seq")
    ref, _ = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ulysses_attention_maps_whole_per_head(mesh):
    q, k, v = make_qkv(1, 8, 64, 16, seed=3)
    out, probs = ulysses_attention(q, k, v, mesh, axis="seq", want_attn=True)
    ref, ref_probs = attention_reference(q, k, v, want_attn=True)
    assert probs.shape == (1, 8, 64, 64)  # full N x N per head
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_output_sharding(mesh):
    """Output stays sequence-sharded — no silent gather."""
    q, k, v = make_qkv(1, 2, 64, 16, seed=4)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh, axis="seq"))(
        q, k, v
    )
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, 2, 8, 16)}


def test_sp_attn_impl_in_vit_forward(mesh):
    """Sequence-parallel attention plugs into the model like any kernel."""
    import jax
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel.sp_attention import make_sp_attn_impl

    # heads divisible by 8 for Ulysses; tokens divisible by 8 for sharding:
    # 32px/16 -> 4+1=5 tokens, not divisible -> use 112px/16 -> 49+1=50...
    # pick img 176/16 -> 121+1=122 tokens; not divisible by 8 either.
    # Use pad_tokens=True: 122 -> pads to 128 = 16 per device, n_real=122.
    cfg = vit.ViTConfig("vit_sp", img_size=176, patch=16, width=64,
                        depth=2, heads=8, num_classes=10)
    params = vit.init_params(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).random((2, 3, 176, 176), np.float32)
    )

    ref = vit.forward(params, x, cfg, want_attn=True)
    impl = make_sp_attn_impl(mesh, axis="seq", kind="ulysses")
    sp = vit.forward(params, x, cfg, want_attn=True, attn_impl=impl,
                     pad_tokens=True)
    np.testing.assert_allclose(
        np.asarray(sp["logits"]), np.asarray(ref["logits"]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sp["attn"][0]), np.asarray(ref["attn"][0]), atol=2e-5
    )

    # ring: no maps, logits only
    ring = make_sp_attn_impl(mesh, axis="seq", kind="ring")
    rp = vit.forward(params, x, cfg, want_attn=False, attn_impl=ring,
                     pad_tokens=True)
    np.testing.assert_allclose(
        np.asarray(rp["logits"]), np.asarray(ref["logits"]), atol=2e-5
    )

    with pytest.raises(ValueError, match="ulysses"):
        vit.forward(params, x, cfg, want_attn=True, attn_impl=ring,
                    pad_tokens=True)


def test_sp_attention_gradients(mesh):
    """Ring/Ulysses differentiate: SP composes with training, not just
    inference (shard_map AD over ppermute/all_to_all)."""
    q, k, v = make_qkv(1, 8, 64, 16, seed=7)

    def loss_ref(q, k, v):
        out, _ = attention_reference(q, k, v)
        return jnp.sum(out ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh, axis="seq") ** 2)

    def loss_uly(q, k, v):
        out, _ = ulysses_attention(q, k, v, mesh, axis="seq")
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_uly = jax.grad(loss_uly, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(g_ref, g_uly):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

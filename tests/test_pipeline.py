"""Pipeline parallelism vs the monolithic forward, on the fake CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.parallel.pipeline import (
    pipeline_apply,
    pipelined_vit_forward,
)

CFG = vit.ViTConfig("vit_pp", img_size=32, patch=16, width=64,
                    depth=8, heads=4, num_classes=10)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("stage",))


@pytest.fixture(scope="module")
def params():
    return vit.init_params(jax.random.key(0), CFG)


def test_pipeline_apply_matches_sequential(mesh, params):
    x = jnp.asarray(
        np.random.default_rng(0).random((8, CFG.tokens, CFG.width), np.float32)
    )

    def layer_fn(p, x):
        y, _, _ = vit.block(p, x, CFG, want_attn=False)
        return y

    piped = pipeline_apply(params["blocks"], x, layer_fn, mesh)
    seq = x
    for p in params["blocks"]:
        seq = layer_fn(p, seq)
    np.testing.assert_allclose(np.asarray(piped), np.asarray(seq), atol=2e-5)


def test_pipelined_vit_matches_monolithic(mesh, params):
    x = jnp.asarray(
        np.random.default_rng(1).random((4, 3, 32, 32), np.float32)
    )
    piped = pipelined_vit_forward(params, x, CFG, mesh)
    mono = vit.forward(params, x, CFG)["logits"]
    np.testing.assert_allclose(np.asarray(piped), np.asarray(mono), atol=2e-5)


def test_pipeline_more_microbatches(mesh, params):
    x = jnp.asarray(
        np.random.default_rng(2).random((8, 3, 32, 32), np.float32)
    )
    piped = pipelined_vit_forward(params, x, CFG, mesh, n_micro=8)
    mono = vit.forward(params, x, CFG)["logits"]
    np.testing.assert_allclose(np.asarray(piped), np.asarray(mono), atol=2e-5)


def test_pipeline_validates_divisibility(mesh, params):
    x = jnp.zeros((3, CFG.tokens, CFG.width), jnp.float32)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(params["blocks"], x,
                       lambda p, x: x, mesh, n_micro=2)
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(params["blocks"][:5], jnp.zeros((4, 8, 8)),
                       lambda p, x: x, mesh)

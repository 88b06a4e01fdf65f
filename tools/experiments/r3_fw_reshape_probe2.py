"""Hypothesis: sublane-merging reshapes lower ONLY when the lane dim is a
multiple of 128 (stage 2/3 of the fused window kernel compiled at C=384/
768; stages 0/1 failed at C=96/192)."""

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_fw_reshape.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


def try_case(name, in_shape, body):
    def kernel(x_ref, y_ref):
        y_ref[...] = body(x_ref[...])

    x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape),
                    jnp.bfloat16)
    try:
        out = jax.eval_shape(body, jax.ShapeDtypeStruct(x.shape, x.dtype))
        fn = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(out.shape, x.dtype))
        ref = np.asarray(jax.jit(body)(x), np.float32)
        got = np.asarray(jax.jit(fn)(x), np.float32)
        ok = bool(np.allclose(got, ref, atol=1e-2))
        emit(case=name, compiles=True, matches=ok)
    except Exception as e:
        emit(case=name, compiles=False, error=str(e)[:120])


try_case("8x7x7x128->392x128", (8, 7, 7, 128), lambda x: x.reshape(392, 128))
try_case("392x128->8x7x7x128", (392, 128), lambda x: x.reshape(8, 7, 7, 128))
try_case("2x7x7x384->98x384", (2, 7, 7, 384), lambda x: x.reshape(98, 384))
try_case("98x384->2x7x7x384", (98, 384), lambda x: x.reshape(2, 7, 7, 384))
try_case("7x7x256->49x256", (7, 7, 256), lambda x: x.reshape(49, 256))
try_case("4x7x7x256->196x256", (4, 7, 7, 256),
         lambda x: x.reshape(196, 256))
emit(stage="done2")

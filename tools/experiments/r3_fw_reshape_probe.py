"""Which in-kernel reshapes/transposes does Mosaic lower on this libtpu?

The fused window kernel's [8,7,7,96]->[392,96] collapse is rejected
(tpu.reshape lowering error) while stage 2's [2,7,7,384]->[98,384]
compiled. Probe the candidate formulations on trivial kernels so the
kernel can be restructured on evidence, not guesses."""

import functools

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_fw_reshape.jsonl")
jax = setup_jax()

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def try_case(name, in_shape, body):
    def kernel(x_ref, y_ref):
        y_ref[...] = body(x_ref[...])

    x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape),
                    jnp.bfloat16)
    try:
        out = jax.eval_shape(body, jax.ShapeDtypeStruct(x.shape, x.dtype))
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out.shape, x.dtype),
        )
        ref = np.asarray(jax.jit(body)(x), np.float32)
        got = np.asarray(jax.jit(fn)(x), np.float32)
        ok = bool(np.allclose(got, ref, atol=1e-2))
        emit(case=name, compiles=True, matches=ok)
    except Exception as e:
        emit(case=name, compiles=False, error=str(e)[:300])


# the failing collapse and near neighbours
try_case("8x7x7x96->392x96", (8, 7, 7, 96),
         lambda x: x.reshape(392, 96))
try_case("2x7x7x96->98x96", (2, 7, 7, 96),
         lambda x: x.reshape(98, 96))
try_case("4x7x7x96->196x96", (4, 7, 7, 96),
         lambda x: x.reshape(196, 96))
try_case("7x7x96->49x96", (7, 7, 96),
         lambda x: x.reshape(49, 96))
try_case("8x7x7x96->56x7x96", (8, 7, 7, 96),
         lambda x: x.reshape(56, 7, 96))
try_case("staged 8x7..->56x7->392", (8, 7, 7, 96),
         lambda x: x.reshape(56, 7, 96).reshape(392, 96))
try_case("49x96->7x7x96", (49, 96), lambda x: x.reshape(7, 7, 96))
try_case("392x96->8x7x7x96", (392, 96), lambda x: x.reshape(8, 7, 7, 96))
# outer transpose used by the strip formulation
try_case("transpose 7x8x7x96->8x7x7x96", (7, 8, 7, 96),
         lambda x: x.transpose(1, 0, 2, 3))
# per-window slice out of a rank-4 strip
try_case("slice+reshape [7,8,7,96][:,3]", (7, 8, 7, 96),
         lambda x: x[:, 3].reshape(49, 96))
# concat of 8 [49,96] windows on sublane
try_case("concat 8x[49,96]->392x96", (8, 7, 7, 96),
         lambda x: jnp.concatenate(
             [x[w].reshape(49, 96) for w in range(8)], axis=0))
emit(stage="done")

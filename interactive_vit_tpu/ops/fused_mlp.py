"""Fused MLP-branch Pallas kernel: LN2 + fc1 + GELU + fc2 + residual.

Companion to ``ops/fused_block.py`` (which fuses the attention branch): one
pallas call per layer computes the whole pre-LN MLP residual branch with the
[N, 4D] hidden activations living only in VMEM. Grid (B, N-blocks): weights'
index maps are constant so Mosaic keeps fc1/fc2 (9.4 MB bf16 for ViT-B)
resident across the grid; each program handles a 128-row strip.

GELU is ALWAYS the tanh approximation here: Mosaic has no erf lowering, and
this kernel is a bf16-path option by dispatch policy (matching
``ops/layers.gelu``'s bf16 behavior; the f32 parity path stays unfused).

MEASURED OPT-IN, NOT DEFAULT: on v5e ViT-B/16 batch-32 this kernel is
slightly SLOWER than XLA's MLP (12.7 vs 11.5 ms/batch with the fused attn
block): XLA runs the MLP as one [B*N, D] x [D, 4D] matmul, which beats
B*ceil(N/128) row-strip programs even after the LN/residual fusion win.
Kept as the building block for shapes where the trade flips (small batch,
wide models) and as the north-star "fused LayerNorm+GELU MLP" kernel with
its honest measurement.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, jnp.ndarray]


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref,
            *, eps: float, prec):
    x = x_ref[0]  # [bq, D]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = (ln * lns_ref[0] + lnb_ref[0]).astype(x.dtype)

    h = jax.lax.dot(
        ln, w1_ref[...], preferred_element_type=jnp.float32, precision=prec
    ) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)

    y = xf + jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32, precision=prec
    ) + b2_ref[0]
    y_ref[0] = y.astype(y_ref.dtype)


def fused_mlp_block(x: jnp.ndarray, p: Params, eps: float = 1e-6,
                    block_q: int = 128) -> jnp.ndarray:
    """x [B, N, D] -> x + MLP(LN2(x)), one pallas call."""
    b, n, d = x.shape
    md = p["fc1_w"].shape[1]
    kernel = functools.partial(_kernel, eps=eps, prec=_precision(x.dtype))
    return pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(n, block_q)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, md), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((md, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(x, p["ln2_s"].reshape(1, d), p["ln2_b"].reshape(1, d),
      p["fc1_w"], p["fc1_b"].reshape(1, md),
      p["fc2_w"], p["fc2_b"].reshape(1, d))


def fits(d: int, mlp_dim: int, dtype, block_q: int = 128) -> bool:
    esize = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    weights = (d * mlp_dim + mlp_dim * d) * esize
    acts = block_q * (d * 3 + mlp_dim) * 4  # f32 working set
    return weights + acts < 12 * 1024 * 1024

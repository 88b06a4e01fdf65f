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


# single source of the precision policy (layers.precision_for docstring);
# a private copy here could silently drift from the backend workaround
from interactive_vit_tpu.ops.layers import precision_for as _precision  # noqa: E402,E501


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


# -- W8A8 variant: int8 x int8 MXU matmuls with in-kernel quantization ---------
#
# The XLA W8A8 path (ops/quant.linear_w8a8) measured SLOWER than bf16 on
# the full model: XLA breaks the quantize/dequantize chains out of the
# matmul fusions (~2.6 ms/iter of relayout copies + ~1.9 ms of reduce
# fusions on ViT-B batch-32, profiler-verified). This kernel keeps the
# whole quantize -> s8 dot -> dequantize -> GELU -> quantize -> s8 dot
# chain in VMEM, so the only HBM traffic is x, y, and the int8 weights
# (half the bf16 bytes). Semantics mirror the jnp path exactly: per-token
# symmetric int8 (ops/quant.quantize_acts) over the f32 view of the
# activations.


def _round_half_up(x):
    # Mosaic has no lowering for round-half-to-even (jnp.round/lax.round
    # with default mode); floor(x + 0.5) — round-half-UP, ties toward +inf
    # for NEGATIVE values too (floor(-1.5 + 0.5) = -1 where jnp.round
    # gives -2) — lowers fine. The divergence from the jnp reference
    # (ops/quant.quantize_acts uses jnp.round) is confined to exact .5
    # grid points of x/scale: a 1-ulp difference on a handful of lattice
    # values, inside the W8A8 noise class. Tests compare logits at the
    # model level.
    return jnp.floor(x + 0.5)


# shared with the s8-scores fused block (ops/quant.py): ONE in-kernel
# quantizer so the two kernels' semantics cannot drift
from interactive_vit_tpu.ops.quant import (  # noqa: E402
    quant_rows_mosaic as _quant_rows,
)


def _w8a8_kernel(x_ref, lns_ref, lnb_ref, w1_ref, s1_ref, b1_ref,
                 w2_ref, s2_ref, b2_ref, y_ref, *, eps: float):
    x = x_ref[...]  # [bq, D] activation dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0] + lnb_ref[0]
    # mirror the jnp path: quantize the activation-dtype view's f32 value
    ln = ln.astype(x.dtype).astype(jnp.float32)

    q1, sx1 = _quant_rows(ln)
    acc1 = jax.lax.dot(q1, w1_ref[...], preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * (sx1 * s1_ref[0]) + b1_ref[0]
    h = jax.nn.gelu(h.astype(x.dtype), approximate=True).astype(jnp.float32)

    q2, sx2 = _quant_rows(h)
    acc2 = jax.lax.dot(q2, w2_ref[...], preferred_element_type=jnp.int32)
    y = xf + acc2.astype(jnp.float32) * (sx2 * s2_ref[0]) + b2_ref[0]
    y_ref[...] = y.astype(y_ref.dtype)


def fused_mlp_w8a8_block(x: jnp.ndarray, p: Params, eps: float = 1e-6,
                         block_q: int = 256) -> jnp.ndarray:
    """x [B, N, D] -> x + MLP_w8a8(LN2(x)), one pallas call.

    ``p["fc1_w"]/p["fc2_w"]`` must be W8A8 leaf-dicts (``ops/quant.py``
    AQKEY/ASKEY). Rows are processed in [block_q, D] strips of the
    flattened [B*N, D] token stream (LN and the MLP are row-local);
    constant weight index maps keep the int8 weights VMEM-resident
    across the grid.
    """
    from interactive_vit_tpu.ops.quant import AQKEY, ASKEY

    b, n, d = x.shape
    w1, w2 = p["fc1_w"], p["fc2_w"]
    md = w1[AQKEY].shape[1]
    rows = b * n
    x2 = x.reshape(rows, d)
    kernel = functools.partial(_w8a8_kernel, eps=eps)
    y2 = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(rows, block_q),),
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, md), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, md), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((md, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(x2, p["ln2_s"].reshape(1, d), p["ln2_b"].reshape(1, d),
      w1[AQKEY], w1[ASKEY].reshape(1, md), p["fc1_b"].reshape(1, md),
      w2[AQKEY], w2[ASKEY].reshape(1, d), p["fc2_b"].reshape(1, d))
    return y2.reshape(b, n, d)


def fits_w8a8(d: int, mlp_dim: int, block_q: int = 256) -> bool:
    """VMEM feasibility: int8 weights (resident) + the dominant
    simultaneous per-strip buffers (f32 hidden + int8 hidden + f32
    row-local activations; Mosaic frees dead temporaries)."""
    weights = d * mlp_dim * 2          # int8 fc1 + fc2
    acts = block_q * (mlp_dim * 5 + d * 12)
    return weights + acts < 13 * 1024 * 1024


def pick_block_q_w8a8(d: int, mlp_dim: int) -> int:
    """Largest row-strip in {512, 256, 128} that fits VMEM (0 = none)."""
    for bq in (512, 256, 128):
        if fits_w8a8(d, mlp_dim, bq):
            return bq
    return 0

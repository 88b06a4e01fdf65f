"""Pallas TPU attention kernels with attention-map taps.

Two kernels, dispatched by sequence length and tap demand (see
``flash_attention``):

1. **Row-resident kernel** (``_rowfull_kernel``): grid (B*H, Nq-blocks); one
   Q block attends to the FULL key range held in VMEM. For ViT-scale
   sequences (197 tokens @224, 577 @384 -> padded 256/640) the whole
   [block_q, N] score tile fits comfortably in VMEM, so the N x N matrix
   never touches HBM *unless tapped* — and when the UI taps attention maps,
   this kernel emits exact post-softmax probabilities as a second output in
   the same pass (solving SURVEY.md §7's "flash never materializes the
   matrix" tension: one fused kernel, maps only when asked).

2. **Online-softmax kernel** (``_online_kernel``): grid (B*H, Nq, Nk) with
   running (m, l, acc) VMEM scratch — textbook flash attention for long
   sequences where a full key row no longer fits; no map emission (a tap on
   a long-seq graph falls back to the row-resident kernel on a padded
   length, or the jnp reference).

Numerics: scores and softmax statistics in f32 (preferred_element_type);
the P @ V matmul feeds the MXU in the value dtype with f32 accumulation.
f32 inputs force HIGHEST precision (this backend's DEFAULT truncates f32
matmuls to bf16 passes — see ops/layers.mm_precision). Matches
``attention_reference`` to <=2e-3 in bf16 and <=1e-5 in f32 (parity tests).

Padding: sequences pad to a multiple of the block (128); padded KEY columns
are masked to -0.7*f32_max before softmax (NaN-safe vs -inf), padded QUERY
rows compute garbage that the caller slices off.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


from interactive_vit_tpu.ops.layers import precision_for as _precision


# -- kernel 1: row-resident (full K per Q block), optional probs output --------


def _rowfull_kernel(q_ref, k_ref, v_ref, o_ref, *maybe_probs,
                    sm_scale: float, n_real: int, prec):
    """One Q block vs the whole key range; exact softmax in one pass."""
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [n_pad, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * sm_scale  # [bq, n_pad]

    n_pad = k.shape[0]
    if n_real != n_pad:  # mask padded key columns (static condition)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, MASK_VALUE)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    probs = p / l

    o_ref[0] = jax.lax.dot(
        probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(o_ref.dtype)

    if maybe_probs:
        maybe_probs[0][0] = probs.astype(maybe_probs[0].dtype)


def _rowfull_call(q, k, v, n_real: int, want_attn: bool, block_q: int):
    """Launch the row-resident kernel on EXACT (non-padded) shapes.

    Pallas/Mosaic handles non-divisible dims: edge blocks are internally
    padded on read and masked on write, so q/k/v come in at their logical
    [bh, n, d] and — crucially — the probs tap is written at exactly
    [bh, n, n] (no padded column traffic, no slice copy afterwards).
    """
    bh, n, d = q.shape
    grid = (bh, pl.cdiv(n, block_q))
    kernel = functools.partial(
        _rowfull_kernel,
        sm_scale=d ** -0.5,
        n_real=n_real,
        prec=_precision(q.dtype),
    )
    out_shape = [jax.ShapeDtypeStruct((bh, n, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_attn:
        out_shape.append(jax.ShapeDtypeStruct((bh, n, n), q.dtype))
        out_specs.append(
            pl.BlockSpec((1, block_q, n), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        )
    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(q, k, v)
    return results if want_attn else (results[0], None)


# -- kernel 2: online softmax over key blocks (long sequences) ------------------


def _online_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                   *, sm_scale: float, n_real: int, block_k: int, prec):
    kv_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * sm_scale  # [bq, bk]

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < n_real, s, MASK_VALUE)
    # zero padded/OOB v rows: their p weights are exp(MASK)==0, but
    # 0 * garbage (NaN under the interpreter, unspecified on chip) would
    # still poison the accumulator through the dot
    vrow = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + kv_idx * block_k
    v = jnp.where(vrow < n_real, v, 0)

    # row stats are stored lane-replicated [bq, LANES] (min f32 tile width);
    # every lane of a row holds the same value
    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)             # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)                   # [bq, LANES]
    alpha = jnp.exp(m_prev - m_next)                       # [bq, LANES]
    p = jnp.exp(s - m_next[:, :1])                         # [bq, bk]
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    m_ref[...] = m_next
    l_ref[...] = l_next

    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(kv_idx == nk - 1)
    def _store():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _online_call(q, k, v, n_real: int, block_q: int, block_k: int):
    bh, n, d = q.shape
    # cdiv grids: Mosaic masks the edge blocks, so no host-side padding —
    # floored grids silently skipped the last partial block of real rows
    # (keys beyond n read garbage but the col < n_real mask kills them;
    # garbage query rows beyond n are never returned to the caller)
    grid = (bh, pl.cdiv(n, block_q), pl.cdiv(n, block_k))
    kernel = functools.partial(
        _online_kernel,
        sm_scale=d ** -0.5,
        n_real=n_real,
        block_k=block_k,
        prec=_precision(q.dtype),
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, d), jnp.float32),      # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out


# -- public entry ----------------------------------------------------------------

# Above this padded length, a full key row per Q block stops being the right
# VMEM trade and the online kernel takes over (when maps aren't tapped).
ROWFULL_MAX_N = 2048


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    want_attn: bool = False,
    n_real: Optional[int] = None,
    block_q: Optional[int] = None,
    block_k: int = 128,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Fused attention on [B, H, N, Dh]; same contract as
    ``attention.attention_reference``.

    When the caller already runs in the padded token domain (``vit.forward``
    pads N to a lane multiple once, end-to-end), pass ``n_real`` — inputs
    then need no copy here and outputs stay padded (probs too); the model
    slices real rows exactly once at tap-extraction time.
    """
    b, h, n, d = q.shape
    n_real = n_real if n_real is not None else n
    if block_q is None:
        # full-row q blocks up to N=1024: K/V DMA'd once per (b,h) instead
        # of once per q block (measured on ViT-L@384 N=577: 165 -> 197
        # imgs/s; at dino_s8's N=785 full-row beats the 256 fallback by
        # +20% maps-off / +13% maps-on — /tmp/r3_s8blockq.jsonl,
        # 2026-08-16). Full-row VMEM at N=1024 is ~4 MB f32 scores +
        # ~2 MB bf16 probs: comfortably in budget.
        block_q = _round_up(n, 8) if n <= 1024 else 256

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, d)

    if want_attn and n > ROWFULL_MAX_N:
        # maps on a very long sequence: the row-resident working set
        # (f32 scores block + probs tap + full K/V rows, x~1.6 compile
        # headroom per CLAUDE.md) exceeds scoped VMEM and a breach is a
        # deterministic COMPILE KILL, not a runtime error — fall back to
        # the jnp reference, which streams the O(N^2) maps through HBM
        from interactive_vit_tpu.ops.attention import attention_reference

        return attention_reference(q, k, v, want_attn=True, n_real=n_real)
    if want_attn or n <= ROWFULL_MAX_N:
        # exact shapes: Mosaic masks the edge blocks, no host-side padding
        out, probs = _rowfull_call(qf, kf, vf, n_real, want_attn,
                                   block_q=min(block_q, _round_up(n, 8)))
    else:
        # exact shapes here too: cdiv grid + Mosaic edge-block masking
        # inside _online_call (no host-side padding)
        out = _online_call(qf, kf, vf, min(n_real, n),
                           block_q=block_q, block_k=block_k)
        probs = None

    out = out.reshape(b, h, n, d)
    if probs is not None:
        probs = probs.reshape(b, h, n, n)
    return out, probs


def flash_mhsa(q, k, v, want_attn=False, n_real=None):
    """Drop-in ``attn_impl`` for ``attention.mhsa``."""
    return flash_attention(q, k, v, want_attn=want_attn, n_real=n_real)

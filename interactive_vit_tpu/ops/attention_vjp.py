"""Trainable Pallas attention: custom-VJP flash kernels for the MXU.

Why this exists: XLA's autodiff of ``attention_reference`` materializes
the f32 ``[B, H, N, N]`` probabilities in HBM on the way down AND re-reads
them (plus their cotangent) on the way up. Profiled on v5e (ViT-B/16,
batch 128, remat off): the attention interior cost ~75 ms of a 166 ms
train step with its dots running at 11-13 TF/s — pure HBM-bandwidth
bound, against 171-180 TF/s for the dense matmuls in the same program
(``tools/experiments/r3_train_profile.py``, 2026-08-19). The reference
has no training at all (``torch.no_grad``,
``/root/reference/main/context.py:79-88``); this is the TPU-native
training fast path.

Design: one forward kernel (the row-resident flash forward reused from
``ops/flash_attention``) plus one backward kernel that RECOMPUTES the
softmax from (q, k) entirely in VMEM — the classic flash-attention
backward. Nothing N x N ever touches HBM in either direction; the
recompute costs one extra [N, N] dot, which is ~free next to the HBM
round-trips it replaces. Residuals are just (q, k, v): activation
memory for the backward drops from O(B H N^2) to O(B N D), which is also
what lets ``remat="auto"`` keep rematerialization OFF at these scales.

Grid: one program per (batch x head) row; the whole [N, N] f32 score
tile lives in VMEM (N=197 -> ~0.9 MB of f32 temporaries per program;
fine through N=1024, bounded by ``TRAIN_MAX_N``). Numerics match
``jax.grad`` of ``attention_reference`` (same f32 softmax, same
f32-accumulated MXU dots): parity tests run the kernels in Pallas
interpret mode on CPU (``tests/test_attention_vjp.py``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interactive_vit_tpu.ops.flash_attention import (
    MASK_VALUE,
    _rowfull_call,
    _round_up,
)
from interactive_vit_tpu.ops.layers import precision_for as _precision

# Above this sequence length the single-program working set (four f32
# [N, N] temporaries ~ 4 * N^2 * 4 B, x~1.6 compile headroom — CLAUDE.md
# "scoped-vmem breaches") stops fitting comfortably; callers fall back to
# the XLA path. ViT-L/16@384 (N=577) is well inside.
TRAIN_MAX_N = 1024


def _probs_recompute(q, k, sm_scale, n_real, prec):
    """Masked softmax(q k^T * scale) for one head, all in VMEM (shared by
    every backward kernel here and the packed forward)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * sm_scale  # [n, n] f32
    if n_real != q.shape[0]:  # static: mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _head_grads(q, k, v, do, *, sm_scale, n_real, prec):
    """Per-head flash backward (ONE copy of the math — both the
    [B,H,N,Dh] and the packed kernel call this).

    Standard decomposition (Dao et al. flash-attention backward, public
    construction): with P = softmax(q k^T * scale),
        dv = P^T do
        dP = do v^T
        ds = P * (dP - rowsum(dP * P))         (softmax VJP)
        dq = ds k * scale,  dk = ds^T q * scale
    All [N, N] intermediates stay in the calling program's VMEM; returns
    f32 (callers cast on store).
    """
    probs = _probs_recompute(q, k, sm_scale, n_real, prec)
    # dv = P^T do : contract the query axis
    dv = jax.lax.dot_general(
        probs.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dP = do v^T : contract the feature axis
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [n, n] f32
    delta = jnp.sum(dp * probs, axis=1, keepdims=True)  # [n, 1]
    ds = (probs * (dp - delta) * sm_scale).astype(q.dtype)
    dq = jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32, precision=prec)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return dq, dk, dv


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, sm_scale: float, n_real: int, prec):
    """Flash backward for one (batch, head): recompute softmax in VMEM."""
    dq, dk, dv = _head_grads(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0],
        sm_scale=sm_scale, n_real=n_real, prec=prec)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_call(q, k, v, do, n_real: int):
    """Launch the backward kernel on exact [bh, n, d] shapes (Mosaic
    masks the edge tiles; no host-side padding)."""
    bh, n, d = q.shape
    spec = pl.BlockSpec((1, n, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_kernel,
        sm_scale=d ** -0.5,
        n_real=n_real,
        prec=_precision(q.dtype),
    )
    return pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((bh, n, d), q.dtype)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_train(q, k, v, n_real: Optional[int] = None):
    """softmax(q k^T / sqrt(dh)) v on [B, H, N, Dh] with a flash VJP.

    Value contract = ``attention.attention_reference(want_attn=False)``
    (f32 softmax, f32-accumulated dots); gradient contract = ``jax.grad``
    of the same. ``n_real`` masks padded key columns (padded-domain
    execution, ``vit.forward(pad_tokens=True)``) and is static.
    """
    out, _ = _fwd_value(q, k, v, n_real)
    return out


def _fwd_value(q, k, v, n_real):
    b, h, n, d = q.shape
    nr = n_real if n_real is not None else n
    out, _ = _rowfull_call(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), nr, False,
        block_q=_round_up(n, 8),
    )
    return out.reshape(b, h, n, d), None


def _fwd_rule(q, k, v, n_real):
    out, _ = _fwd_value(q, k, v, n_real)
    return out, (q, k, v)


def _bwd_rule(n_real, res, do):
    q, k, v = res
    b, h, n, d = q.shape
    nr = n_real if n_real is not None else n
    dq, dk, dv = _bwd_call(
        q.reshape(b * h, n, d), k.reshape(b * h, n, d),
        v.reshape(b * h, n, d), do.reshape(b * h, n, d), nr,
    )
    rs = lambda x: x.reshape(b, h, n, d)  # noqa: E731
    return rs(dq), rs(dk), rs(dv)


attention_train.defvjp(_fwd_rule, _bwd_rule)


def trainable_flash_mhsa(q, k, v, want_attn: bool = False,
                         n_real: Optional[int] = None
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Drop-in ``attn_impl`` for ``attention.mhsa`` inside train steps.

    Falls back to the XLA reference when maps are requested (training
    never taps them) or the sequence exceeds the kernel's VMEM budget.
    """
    if want_attn or q.shape[2] > TRAIN_MAX_N:
        from interactive_vit_tpu.ops.attention import attention_reference

        return attention_reference(q, k, v, want_attn=want_attn,
                                   n_real=n_real)
    return attention_train(q, k, v, n_real), None


# -- packed-layout variant: zero transposes around the custom call -------------
#
# The [B,H,N,Dh] contract above costs real HBM copies: XLA cannot fuse
# across a custom-call boundary, so the [B,N,H,Dh]<->[B,H,N,Dh] layout
# moves around the kernel materialize — profiled as twelve 2.0-ms
# "transpose_jvp" copies per vit_b16@128 step (~16% of the post-kernel
# step; docs/kernels.md "Training fast path"). The packed variant
# consumes the fused qkv activation [B, N, 3*D] DIRECTLY in the
# head-major column layout ([H][3][Dh] — the existing Megatron TP
# packing, ``parallel/mesh.permute_qkv_head_major``) and emits
# out [B, N, D] in head order: no transpose exists in the program, and
# the backward's dqkv lands exactly where the qkv matmul's VJP wants it.
#
# Mosaic lane rule (probed on-chip for the swin kernel): lane-dim blocks
# must be 128-multiples. One head's slab is 3*64 = 192 lanes — not
# addressable — so each program owns a head PAIR (384 = 3x128 lanes) and
# slices q/k/v per head in-register. Requires even heads and Dh == 64
# (every ViT family variant here); odd-head models keep the transposing
# path.

PACKED_DH = 64
_PAIR = 6 * PACKED_DH  # [q0 k0 v0 q1 k1 v1] lane slab


def packed_ok(heads: int, dh: int, n: int) -> bool:
    """The packed kernel's applicability (mhsa consults this)."""
    return dh == PACKED_DH and heads % 2 == 0 and n <= TRAIN_MAX_N


def _packed_heads(s, h: int):
    base = h * 3 * PACKED_DH
    q = s[:, base:base + PACKED_DH]
    k = s[:, base + PACKED_DH:base + 2 * PACKED_DH]
    v = s[:, base + 2 * PACKED_DH:base + 3 * PACKED_DH]
    return q, k, v


def _packed_fwd_kernel(qkv_ref, o_ref, *, sm_scale, n_real, prec):
    s = qkv_ref[0]  # [n, 384]
    outs = []
    for h in range(2):
        q, k, v = _packed_heads(s, h)
        probs = _probs_recompute(q, k, sm_scale, n_real, prec)
        outs.append(jax.lax.dot(
            probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=prec,
        ))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _packed_bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, sm_scale, n_real,
                       prec):
    s = qkv_ref[0]   # [n, 384]
    do = do_ref[0]   # [n, 128]
    grads = []
    for h in range(2):
        q, k, v = _packed_heads(s, h)
        doh = do[:, h * PACKED_DH:(h + 1) * PACKED_DH]
        dq, dk, dv = _head_grads(q, k, v, doh, sm_scale=sm_scale,
                                 n_real=n_real, prec=prec)
        grads += [dq, dk, dv]
    dqkv_ref[0] = jnp.concatenate(grads, axis=1).astype(dqkv_ref.dtype)


def _packed_call(kernel_fn, qkv, extra, out_lanes: int, n_real: int):
    b, n, d3 = qkv.shape
    pairs = d3 // _PAIR
    kern = functools.partial(
        kernel_fn, sm_scale=PACKED_DH ** -0.5, n_real=n_real,
        prec=_precision(qkv.dtype))
    in_specs = [pl.BlockSpec((1, n, _PAIR), lambda b, j: (b, 0, j),
                             memory_space=pltpu.VMEM)]
    args = [qkv]
    if extra is not None:  # backward: the out-cotangent, [B, N, D]
        in_specs.append(
            pl.BlockSpec((1, n, 2 * PACKED_DH), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM))
        args.append(extra)
    return pl.pallas_call(
        kern,
        grid=(b, pairs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, out_lanes), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, pairs * out_lanes),
                                       qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def attention_train_packed(qkv, n_real: Optional[int] = None):
    """Flash attention on the packed head-major qkv activation.

    ``qkv``: [B, N, 3*D] in the [H][3][Dh] column layout
    (``permute_qkv_head_major`` weights + ``head_major=True`` forward).
    Returns [B, N, D] in head order — exactly what the output projection
    consumes. Value/grad contract = the [B,H,N,Dh] ``attention_train``
    modulo layout.
    """
    nr = n_real if n_real is not None else qkv.shape[1]
    return _packed_call(_packed_fwd_kernel, qkv, None, 2 * PACKED_DH, nr)


def _packed_fwd_rule(qkv, n_real):
    return attention_train_packed(qkv, n_real), qkv


def _packed_bwd_rule(n_real, qkv, do):
    nr = n_real if n_real is not None else qkv.shape[1]
    return (_packed_call(_packed_bwd_kernel, qkv, do, _PAIR, nr),)


attention_train_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)

trainable_flash_mhsa.packed = attention_train_packed
trainable_flash_mhsa.packed_ok = packed_ok

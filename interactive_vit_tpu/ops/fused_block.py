"""Fused attention-block Pallas kernel: LN1 + QKV + MHSA + proj + residual.

Profiling the XLA path on v5e (ViT-B/16, batch 32, maps on) showed the
attention softmax dominating: ~7.4 ms/batch of ``convert_reduce_fusion`` —
XLA materializes the [B, H, N, N] f32 logits in HBM and makes ~3 passes over
them — plus ~2.7 ms of layout copies around the per-head transposes. This
kernel keeps the ENTIRE attention block for one image resident in VMEM:

    grid = (B,); per program:
      x[N, D] -> f32 LayerNorm -> one [N, D] @ [D, 3D] QKV matmul (MXU)
      -> per-head (static unroll): s = q k^T, exact softmax (all f32, all
         VMEM), optional probs emission straight to the [H, N, N] tap output
      -> concat heads -> [N, D] @ [D, D] proj -> + residual -> y

The N x N scores NEVER touch HBM; the only N^2 HBM traffic is the bf16
probs tap itself when the UI asks for maps. Weights are full-block inputs
whose index map is constant, so Mosaic keeps them VMEM-resident across the
batch grid. VMEM budget (ViT-B, N=197): ~9 MB < 16 MB/core.

Fits models with D*3D weights under ~8 MB (ViT-B: 3.4 MB bf16; ViT-L: 6 MB)
and N up to ~600 (ViT-L/16@384). Dispatch falls back to the unfused path
otherwise (``ops/dispatch.default_block_impl``).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, jnp.ndarray]


from interactive_vit_tpu.ops.layers import precision_for as _precision


# Overflow guard for the no-max-subtract softmax: exp(80) = 5.5e34 and a
# row sums <= N * exp(80) ~ 1e37 < f32 max (3.4e38) for N up to ~6000.
# Trained-ViT attention logits sit around |s| <= ~40, so the clamp never
# engages in practice — it only bounds the pathological case.
_SOFTMAX_CLAMP = 80.0


def _row_softmax(s, fast: bool):
    """Row softmax returning (unnormalized p, reciprocal row-sum r).

    ``fast=True`` skips the max-subtract pass: the lane-wise max reduction
    + [N, N] subtract are pure VPU latency serialized between the two MXU
    dots of every head; a clamp gives the same overflow safety for one
    cheap elementwise op (exactness: softmax is shift-invariant, so modulo
    f32 rounding the results are identical whenever |s| < 80 — always, for
    real attention logits). Division is deferred to the caller: normalize
    taps with one multiply, or fold r into the [N, dh] output instead of
    the [N, N] probs (maps-off path)."""
    if fast:
        p = jnp.exp(jnp.minimum(s, _SOFTMAX_CLAMP))
    else:
        p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    return p, 1.0 / jnp.sum(p, axis=1, keepdims=True)


# the ONE in-kernel s8 quantizer pair, shared with the W8A8 MLP kernel
# so the quantization semantics cannot drift between modules
from interactive_vit_tpu.ops.quant import (  # noqa: E402
    quant_cols_mosaic as _quant_cols, quant_rows_mosaic as _quant_rows,
)


def _kernel(x_ref, lns_ref, lnb_ref, qkvw_ref, qkvb_ref, projw_ref,
            projb_ref, *rest, heads: int, eps: float,
            prec, emit: bool, emit_mean: bool, fast: bool, bb: int,
            emit_heads=None, with_bias: bool = False,
            emit_metric: bool = False, int8_scores: bool = False,
            int8_pv: bool = True):
    # rest = ([kb_ref] if with_bias) + (y_ref, *tap outputs)
    kb_ref = rest[0] if with_bias else None
    y_ref, *taps = rest[1 if with_bias else 0:]
    probs_ref = taps[0] if emit else None
    mean_ref = taps[1 if emit else 0] if emit_mean else None
    metric_ref = taps[-1] if emit_metric else None
    # selective per-head tap emission (VERDICT r2 #3): emit_heads is a
    # STATIC tuple of head indices -> tap row; the head loop below is a
    # static unroll, so non-selected heads skip the HBM write entirely
    tap_row = ({h: i for i, h in enumerate(emit_heads)}
               if emit_heads is not None else None)
    # bb images per program (measured ~4.5% on v5e at bb=2: per-program
    # fixed cost amortizes and image i+1's score dots overlap image i's
    # VPU softmax tail). Merging the bb images' LN/QKV/proj into single
    # [bb*N, ...] dots was measured SLOWER (258 vs 235 us): row offsets of
    # N=197 are sublane-tile-misaligned, so the per-image slices of the
    # merged qkv pay VPU shuffles that outweigh the fill/drain savings.
    for b in range(bb):
        x = x_ref[b]  # [N, D]
        n, d = x.shape
        dh = d // heads
        scale = dh ** -0.5

        # LayerNorm in f32
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        ln = (xf - mean) * jax.lax.rsqrt(var + eps)
        ln = (ln * lns_ref[0] + lnb_ref[0]).astype(x.dtype)

        # fused QKV projection: one big MXU matmul
        qkv = jax.lax.dot(
            ln, qkvw_ref[...], preferred_element_type=jnp.float32,
            precision=prec
        )
        qkv = (qkv + qkvb_ref[0]).astype(x.dtype)  # [N, 3D]

        outs = []
        msum = None  # head-mean accumulator, f32 in VMEM
        ksum = None  # head-mean KEY accumulator (ToMe matching metric)
        for h in range(heads):
            q = qkv[:, h * dh:(h + 1) * dh]
            k = qkv[:, d + h * dh: d + (h + 1) * dh]
            v = qkv[:, 2 * d + h * dh: 2 * d + (h + 1) * dh]
            if emit_metric:
                kf = k.astype(jnp.float32)
                ksum = kf if ksum is None else ksum + kf
            if int8_scores:
                # opt-in accuracy class (--attn int8-scores): per-row
                # symmetric s8 q/k, s8xs8->s32 score dot on the int8 MXU
                # rate (measured 1.47x the dh=64 bf16 dot in-fusion —
                # docs/kernels.md "dh=64 attention-dot probes"), rank-1
                # f32 dequant. Quantized scores perturb the softmax and
                # therefore the SERVED maps, unlike W8A8-MLP.
                qq, qs = _quant_rows(q.astype(jnp.float32))
                kq, ks = _quant_rows(k.astype(jnp.float32))
                si = jax.lax.dot_general(
                    qq, kq, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                s = si.astype(jnp.float32) * (qs * scale) * ks.T
            else:
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ) * scale  # [N, N] f32, VMEM-resident
            if with_bias:
                # proportional attention (ToMe): per-KEY additive logit
                # bias, shared by every head and every query row
                # (kb_ref[b] is [1, N] — broadcasts over the N rows)
                s = s + kb_ref[b]
            p, r = _row_softmax(s, fast)
            emit_this = emit and (tap_row is None or h in tap_row)
            if emit_this or emit_mean:
                probs = p * r  # one multiply instead of a division pass
                pb = probs.astype(x.dtype)  # cast once; tap + dot reuse it
                if emit_this:
                    probs_ref[b, h if tap_row is None else tap_row[h]] = pb
                if emit_mean:
                    msum = probs if msum is None else msum + probs
                if int8_scores and int8_pv:
                    # s8 PV dot: probs per-row (nonnegative, rowmax
                    # scale), v per-column; rank-1 f32 dequant
                    pq, ps = _quant_rows(probs)
                    vq, vs = _quant_cols(v.astype(jnp.float32))
                    oi = jax.lax.dot(pq, vq,
                                     preferred_element_type=jnp.int32)
                    outs.append(oi.astype(jnp.float32) * ps * vs)
                else:
                    outs.append(
                        jax.lax.dot(pb, v,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    )
            else:
                # maps-off: never normalize the [N, N] probs at all — fold
                # the reciprocal row-sum into the [N, dh] head output
                if int8_scores and int8_pv:
                    pq, ps = _quant_rows(p)
                    vq, vs = _quant_cols(v.astype(jnp.float32))
                    oi = jax.lax.dot(pq, vq,
                                     preferred_element_type=jnp.int32)
                    outs.append(oi.astype(jnp.float32) * (ps * r) * vs)
                else:
                    o = jax.lax.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                    outs.append(o * r)
        if emit_mean:
            # head-mean tap: rollout consumes this [N, N] instead of
            # re-reading (and re-laying-out) the full [H, N, N] probs from
            # HBM — measured ~2.3 ms/batch-32 of copy + convert_reduce
            mean_ref[b] = (msum * (1.0 / heads)).astype(mean_ref.dtype)
        if emit_metric:
            # head-meaned attention keys [N, dh] f32 — the published ToMe
            # matching metric; k never leaves VMEM otherwise
            metric_ref[b] = ksum * (1.0 / heads)

        o = jnp.concatenate(outs, axis=-1).astype(x.dtype)  # [N, D]
        y = xf + jax.lax.dot(
            o, projw_ref[...], preferred_element_type=jnp.float32,
            precision=prec
        ) + projb_ref[0]
        y_ref[b] = y.astype(y_ref.dtype)


def fused_attn_block(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    eps: float = 1e-6,
    want_attn: bool = False,
    want_mean: bool = False,
    fast_softmax: bool = True,
    attn_heads: Optional[Tuple[int, ...]] = None,
    key_bias: Optional[jnp.ndarray] = None,
    want_metric: bool = False,
    int8_scores: bool = False,
    int8_pv: bool = True,
):
    """x [B, N, D] -> (x + proj(MHSA(LN(x))), probs [B, H, N, N] | None).

    ``want_mean=True`` appends a third result: the head-mean post-softmax
    maps [B, N, N] (activation dtype, f32-accumulated in-kernel — the
    rollout's input) so consumers never touch the full per-head tensor.
    ``fast_softmax`` (default): clamp-guarded no-max-subtract softmax with
    deferred normalization (see ``_row_softmax``).
    ``attn_heads``: static head subset for the probs tap — the emitted
    maps are [B, len(attn_heads), N, N] in that order, and non-selected
    heads never write their N x N block to HBM (a UI viewing 2 of 16
    heads stores 8x less tap memory; VERDICT r2 #3).
    ``key_bias``: optional [B, N] f32 per-KEY additive logit bias shared
    across heads/rows — ToMe's proportional attention
    (softmax(qk/sqrt(dh) + log s); ``ops/tome_ops`` module doc).
    ``want_metric``: append the head-meaned attention keys [B, N, dh]
    f32 (the ToMe matching metric) as the LAST result.
    ``int8_scores``: opt-in accuracy class (``--attn int8-scores``) —
    per-row symmetric s8 quantization of q/k (and probs/v for the PV
    dot, ``int8_pv``) so both per-head dots run at the int8 MXU rate.
    NOTE: measured END-TO-END LOSS (-10..18% — the quantize/dequant VPU
    work swamps the isolated dot's 1.47x; docs/kernels.md "int8 score
    dots: measured LOSS"). Kept as the documented close of the dh=64
    investigation; quantized scores perturb the softmax, so SERVED MAPS
    change too (unlike W8A8-MLP).
    """
    b, n, d = x.shape
    emit_heads = None
    if want_attn and attn_heads is not None:
        emit_heads = tuple(sorted(set(int(h) for h in attn_heads)))
        if not emit_heads:
            # an empty subset would build a zero-size Pallas output
            # block — a FATAL Mosaic compile error, not a clean raise;
            # callers wanting "no maps" pass want_attn=False
            raise ValueError("attn_heads must be non-empty when "
                             "want_attn=True (None = all heads)")
        if any(h < 0 or h >= heads for h in emit_heads):
            raise ValueError(f"attn_heads {attn_heads} out of range "
                             f"for {heads} heads")
    n_emit = heads if emit_heads is None else len(emit_heads)
    # two images per program when the batch divides (measured ~4.5% on
    # v5e; VMEM stays within budget — weights are shared across the loop)
    bb = 2 if b % 2 == 0 and b > 1 else 1
    kernel = functools.partial(
        _kernel, heads=heads, eps=eps, prec=_precision(x.dtype),
        emit=want_attn, emit_mean=want_mean, fast=fast_softmax, bb=bb,
        emit_heads=emit_heads, with_bias=key_bias is not None,
        emit_metric=want_metric, int8_scores=int8_scores,
        int8_pv=int8_pv,
    )

    in_specs = [
        pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, p["ln1_s"].reshape(1, d), p["ln1_b"].reshape(1, d),
                p["qkv_w"], p["qkv_b"].reshape(1, 3 * d),
                p["proj_w"], p["proj_b"].reshape(1, d)]
    if key_bias is not None:
        # rank-3 [B, 1, N]: Mosaic requires the trailing TWO block dims
        # to be (8,128)-divisible or equal to the array dims — (bb, 197)
        # is neither, (1, 197) block-of-[B, 1, 197] is (the ln-scale
        # trick). Interpret mode does not check tiling; this failed only
        # on real hardware.
        in_specs.append(pl.BlockSpec((bb, 1, n), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(key_bias.astype(jnp.float32)[:, None, :])
    out_shape = [jax.ShapeDtypeStruct((b, n, d), x.dtype)]
    out_specs = [
        pl.BlockSpec((bb, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if want_attn:
        out_shape.append(jax.ShapeDtypeStruct((b, n_emit, n, n), x.dtype))
        out_specs.append(
            pl.BlockSpec((bb, n_emit, n, n), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if want_mean:
        # activation dtype: halves the L*B*N^2 HBM write; the rollout
        # upcasts to f32 (it consumed bf16 per-head probs before, so the
        # numerics class is unchanged)
        out_shape.append(jax.ShapeDtypeStruct((b, n, n), x.dtype))
        out_specs.append(
            pl.BlockSpec((bb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if want_metric:
        out_shape.append(
            jax.ShapeDtypeStruct((b, n, d // heads), jnp.float32))
        out_specs.append(
            pl.BlockSpec((bb, n, d // heads), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    results = pl.pallas_call(
        kernel,
        grid=(b // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # same treatment as the headwise kernel: the default 16M
            # scoped-vmem limit is conservative (v5e has 128M physical)
            # and a breach is a deterministic COMPILE failure that kills
            # the whole program; fits() budgets against this limit with
            # bb and streamed-block double-buffering modeled
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*operands)

    y = results[0]
    probs = results[1] if want_attn else None
    out = [y, probs]
    if want_mean:
        out.append(results[2 if want_attn else 1])
    if want_metric:
        out.append(results[-1])
    return tuple(out) if len(out) > 2 else (y, probs)


#: head-group working-set budget. The kernel's pallas_call raises the
#: scoped-vmem limit to a flat 48M (see the CompilerParams note below), so
#: this is bounded by real VMEM headroom, not the default 16M scoped limit
#: (which killed the whole ViT-L maps-on compile when hb=4's true stack
#: hit 18.77M — bisected 2026-08-16). 22M admits hb=4 maps-on / hb=8
#: maps-off at ViT-L/16@384.
_HEADWISE_BUDGET = 22 * 1024 * 1024


def _headwise_bytes(n: int, d: int, dh: int, hb: int, esize: int,
                    emit: bool, emit_mean: bool) -> int:
    """Per-program VMEM estimate for one hb-head group, calibrated
    against compiler scoped-vmem OOMs on ViT-L/16@384 (16 MB scoped
    limit): streamed input/output activation blocks (qkv columns, x, y)
    double-buffer across the grid; the per-head s/probs temporaries and
    tap output blocks are single-buffered. Observed: maps-on hb=8 needs
    19.96 M (OOM), maps-off hb=16 needs 17.58 M (OOM); maps-on hb=4 and
    maps-off hb=8 compile and run."""
    per = (
        2 * n * 3 * hb * dh * esize       # qkv column blocks (x2 buf)
        + n * n * 4 * 2                   # s + probs f32 (reused per head)
        + (hb * n * n * esize if emit else 0)       # probs tap block
        + (n * n * 4 + n * n * esize if emit_mean else 0)  # mean acc+out
        + hb * dh * d * esize             # proj slice
        + n * d * 4                       # f32 accumulator scratch
        + 2 * n * d * esize * 2           # x + y blocks (x2 buf)
    )
    return per


def _head_group(dh: int, heads: int, n: int = 0, d: int = 0,
                esize: int = 2, emit: bool = True,
                emit_mean: bool = True) -> int:
    """Heads per program for the packed headwise layout: the largest
    POWER-OF-TWO multiple of Mosaic's 128-lane column granule (128/dh
    heads) that divides ``heads`` and fits the VMEM budget (non-power-of-
    two groups like hb=6 are not tried — untested block shapes). Bigger
    groups cut the sequential group-grid depth (fewer f32-accumulator
    round-trips) — measured on ViT-L/16@384: hb 2 -> 8 took the maps-on
    block from 289 to 233 us/batch-8. Returns 0 if dh can't pack into
    128 lanes."""
    base = 128 // dh if (dh <= 128 and 128 % dh == 0) else 0
    if not base or heads % base:
        return 0
    if not n:  # legacy callers without sizes: the minimal packing group
        return base
    best = 0
    hb = base
    while hb <= heads:
        if heads % hb == 0 and _headwise_bytes(
                n, d, dh, hb, esize, emit, emit_mean) < _HEADWISE_BUDGET:
            best = hb
        hb *= 2
    return best


def _headwise_kernel(x_ref, q_ref, k_ref, v_ref, projw_ref, projb_ref,
                     y_ref, *rest, dh: int, heads: int, prec, emit: bool,
                     emit_mean: bool, packed: bool, fast: bool):
    """Per-(image, head-group) program: attention for ``hb`` heads + their
    slice of the output projection, accumulated across the group grid axis.

    The identity concat(o_h) @ W = sum_h o_h @ W[h*dh:(h+1)*dh] lets each
    head contribute its rank-dh share of the projected output, so the
    VMEM working set stays per-group — this is what makes ViT-L/16@384
    (16 heads x 640^2 maps, too big for the one-program-per-image kernel)
    fit. y accumulates in an f32 scratch, written once on the last group.

    ``packed``: q/k/v refs are [1, N, hb*dh] column-blocks of the SAME
    untransposed [B, N, 3D] QKV tensor, selected purely by index map
    (Mosaic wants 128-divisible column blocks, so hb = 128/dh heads ride
    in one program). The [B,H,N,*] transpose this replaces was a 28 MB
    relayout per block (~2.6 ms/iter of "data formatting" on the
    ViT-L/16@384 trace). Non-packing head dims fall back to the
    transposed layout (``packed=False``: rank-4 [1,1,N,dh] refs).
    """
    rest = list(rest)
    probs_ref = rest.pop(0) if emit else None
    mean_ref = rest.pop(0) if emit_mean else None
    acc_ref = rest.pop(0)
    mean_acc_ref = rest.pop(0) if emit_mean else None
    g = pl.program_id(1)
    ng = pl.num_programs(1)
    sm_scale = dh ** -0.5

    if packed:
        q_all, k_all, v_all = q_ref[0], k_ref[0], v_ref[0]  # [N, hb*dh]
        hb = q_all.shape[-1] // dh
    else:
        q_all, k_all, v_all = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]  # [N, dh]
        hb = 1

    outs = []
    msum = None
    for j in range(hb):
        q = q_all[:, j * dh:(j + 1) * dh]
        k = k_all[:, j * dh:(j + 1) * dh]
        v = v_all[:, j * dh:(j + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * sm_scale
        p, r = _row_softmax(s, fast)
        if emit or emit_mean:
            probs = p * r
            pb = probs.astype(v.dtype)  # cast once; tap AND dot reuse it
            if emit:
                probs_ref[0, j] = pb
            if emit_mean:
                msum = probs if msum is None else msum + probs
            outs.append(
                jax.lax.dot(pb, v, preferred_element_type=jnp.float32,
                            precision=prec)
            )
        else:
            # two-pass no-probs path: normalization folds into [N, dh]
            o = jax.lax.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32,
                            precision=prec)
            outs.append(o * r)

    if emit_mean:
        # accumulate across the sequential group axis in an f32 scratch
        # (accumulating in the bf16 output would compound rounding per
        # group, diverging from fused_attn_block's f32-accumulated mean);
        # the output block is written once, on the last group
        contrib_m = msum * (1.0 / heads)

        @pl.when(g == 0)
        def _mean_init():
            mean_acc_ref[...] = contrib_m

        @pl.when(g != 0)
        def _mean_acc():
            mean_acc_ref[...] = mean_acc_ref[...] + contrib_m

        @pl.when(g == ng - 1)
        def _mean_store():
            mean_ref[0] = mean_acc_ref[...].astype(mean_ref.dtype)

    o = outs[0] if hb == 1 else jnp.concatenate(outs, axis=-1)
    contrib = jax.lax.dot(o.astype(v_all.dtype), projw_ref[0],
                          preferred_element_type=jnp.float32, precision=prec)

    @pl.when(g == 0)
    def _init():
        acc_ref[...] = x_ref[0].astype(jnp.float32) + projb_ref[0] + contrib

    @pl.when(g != 0)
    def _acc():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(g == ng - 1)
    def _store():
        y_ref[0] = acc_ref[...].astype(y_ref.dtype)


def headwise_attn_block(
    x: jnp.ndarray,
    p: Params,
    heads: int,
    eps: float = 1e-6,
    want_attn: bool = False,
    want_mean: bool = False,
    fast_softmax: bool = True,
    attn_heads: Optional[Tuple[int, ...]] = None,
):
    """Fused attention branch for models too big for ``fused_attn_block``.

    LN + QKV run in XLA (they are plain fused matmuls there); the kernel
    grid is (B, heads/hb): per-head attention with optional per-head map
    emission and projection accumulation. Same contract as
    ``fused_attn_block``, including ``attn_heads`` selective tap emission
    — here the subset maps are recomputed in XLA from the qkv this
    function already produced (one [N,N] dot + softmax per selected head;
    the kernel grid runs maps-off, so non-selected heads never write
    N x N HBM blocks — the ViT-L/16@384 batch-32 un-OOM path)."""
    from interactive_vit_tpu.ops import layers as L

    b, n, d = x.shape
    dh = d // heads
    ln = L.layer_norm(x, p["ln1_s"], p["ln1_b"], eps)
    qkv = L.linear(ln, p["qkv_w"], p["qkv_b"])  # [B, N, 3D], untransposed

    sel_probs = None
    if want_attn and attn_heads is not None:
        sel = tuple(sorted(set(int(h) for h in attn_heads)))
        if not sel:
            # jnp.stack([]) below would raise an opaque ValueError;
            # match fused_attn_block's explicit contract instead
            raise ValueError("attn_heads must be non-empty when "
                             "want_attn=True (None = all heads)")
        if any(h < 0 or h >= heads for h in sel):
            raise ValueError(f"attn_heads {attn_heads} out of range "
                             f"for {heads} heads")
        prec = _precision(x.dtype)
        maps = []
        for h in sel:
            q = qkv[:, :, h * dh:(h + 1) * dh]
            k = qkv[:, :, d + h * dh: d + (h + 1) * dh]
            s = jnp.einsum("bnd,bmd->bnm", q, k,
                           preferred_element_type=jnp.float32,
                           precision=prec) * (dh ** -0.5)
            maps.append(jax.nn.softmax(s, axis=-1).astype(x.dtype))
        sel_probs = jnp.stack(maps, axis=1)  # [B, |sel|, N, N]
        want_attn = False  # the kernel itself runs maps-off

    # head packing: Mosaic column blocks must be 128-divisible, so ride
    # hb = k*128/dh heads per program straight off the untransposed QKV —
    # the largest k whose working set fits VMEM (fewer sequential groups)
    esize = 2 if x.dtype in (jnp.bfloat16, jnp.float16) else 4
    hb = _head_group(dh, heads, n=n, d=d, esize=esize,
                     emit=want_attn, emit_mean=want_mean)
    packed = hb > 0
    hb = hb or 1
    ng = heads // hb

    kernel = functools.partial(
        _headwise_kernel, dh=dh, heads=heads, prec=_precision(x.dtype),
        emit=want_attn, emit_mean=want_mean, packed=packed,
        fast=fast_softmax,
    )
    out_shape = [jax.ShapeDtypeStruct((b, n, d), x.dtype)]
    out_specs = [
        pl.BlockSpec((1, n, d), lambda i, g: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_attn:
        out_shape.append(jax.ShapeDtypeStruct((b, heads, n, n), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, hb, n, n), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    if want_mean:
        out_shape.append(jax.ShapeDtypeStruct((b, n, n), x.dtype))
        out_specs.append(
            pl.BlockSpec((1, n, n), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )

    if packed:
        w = hb * dh  # == 128
        qkv_args = (qkv, qkv, qkv)
        qkv_specs = [
            # q/k/v: 128-wide column blocks of the one [B, N, 3D] tensor,
            # picked by block index (col block g / ng+g / 2*ng+g)
            pl.BlockSpec((1, n, w), lambda i, g: (i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, w), lambda i, g: (i, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, w), lambda i, g: (i, 0, 2 * ng + g),
                         memory_space=pltpu.VMEM),
        ]
        projw = p["proj_w"].reshape(ng, w, d)
    else:
        # fallback: per-head transposed layout (pays the relayout copy)
        qh = (qkv.reshape(b, n, 3, heads, dh).transpose(2, 0, 3, 1, 4))
        qkv_args = (qh[0], qh[1], qh[2])  # each [B, H, N, dh]
        qkv_specs = [
            pl.BlockSpec((1, 1, n, dh), lambda i, g: (i, g, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ]
        projw = p["proj_w"].reshape(heads, dh, d)

    results = pl.pallas_call(
        kernel,
        grid=(b, ng),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *qkv_specs,
            pl.BlockSpec((1, hb * dh, d), lambda i, g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((n, d), jnp.float32)]
            + ([pltpu.VMEM((n, n), jnp.float32)] if want_mean else [])
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the default 16M scoped-vmem limit is conservative (v5e has
            # 128M physical VMEM) and its breach is a COMPILE failure that
            # killed the whole ViT-L maps-on program (bisected 2026-08-16:
            # hb=4 stack 18.77M; hb=8 32.76M — the compiler's true stack
            # runs up to ~1.6x the working-set estimate because streamed
            # blocks, including the tap outputs, double-buffer). A flat
            # generous limit keeps group widening safe; real usage is
            # bounded by the picked group's working set, not this cap.
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(x, *qkv_args, projw, p["proj_b"].reshape(1, d))
    y = results[0]
    probs = results[1] if want_attn else sel_probs
    if want_mean:
        return y, probs, results[-1]
    return y, probs


def fits(n: int, d: int, heads: int, dtype,
         int8_scores: bool = False) -> bool:
    """VMEM feasibility estimate for one ``fused_attn_block`` program.

    Models what actually compiles: bb=2 images per program, and streamed
    blocks (acts/scores/taps) double-buffer — the compiler's true stack
    runs up to ~1.6x the naive working set (CLAUDE.md scoped-vmem notes;
    the headwise kernel measured 18.77M allocated vs 16.7M estimated).
    Budget = the 48M ``vmem_limit_bytes`` the pallas_call requests, so a
    shape this admits cannot hit the deterministic whole-program
    compile kill a scoped-vmem breach causes.

    ``int8_scores``: the s8 score-dot path keeps EXTRA residency live
    per head — s8 q/k copies + the s32 [N, N] score alongside its f32
    dequant — so a geometry at the bf16 envelope boundary could breach
    scoped VMEM (a deterministic compile kill) while the plain estimate
    admits it (advisor r4 low). Model the extra blocks instead of
    reusing the bf16 envelope."""
    esize = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    weights = d * 3 * d * esize + d * d * esize    # VMEM-resident, single
    acts = n * d * esize * 3 + n * 3 * d * esize   # x, ln, y, qkv
    scores = n * n * 4 * 3                         # s + probs + mean acc f32
    if int8_scores:
        dh = d // max(1, heads)
        # s32 score dot live beside its f32 dequant, + s8 q/k/v copies
        # and their f32 row/col scale vectors
        scores += n * n * 4 + 3 * n * dh + 3 * n * 4
    probs_tap = heads * n * n * esize
    bb = 2
    streamed = bb * (acts + scores + probs_tap)
    total = weights + int(1.6 * streamed)
    return total < 48 * 1024 * 1024


def fits_headwise(n: int, d: int, heads: int, dtype) -> bool:
    """VMEM feasibility for one ``headwise_attn_block`` program: the
    SMALLEST head group (128/dh heads) must fit; ``_head_group`` then
    widens the group as far as the budget allows."""
    esize = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    dh = d // heads
    base = _head_group(dh, heads) or 1
    return _headwise_bytes(n, d, dh, base, esize, emit=True,
                           emit_mean=True) < _HEADWISE_BUDGET

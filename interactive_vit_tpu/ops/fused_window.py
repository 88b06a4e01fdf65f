"""Fused Swin window-attention Pallas kernel: QKV + W-MSA + proj, in VMEM.

The XLA swin path is layout-bound, not FLOP-bound: the round-3 swin_t
batch-128 trace (docs/kernels.md "Swin on v5e") reads 39.1 ms (24%) of
"data formatting" — the window partition/merge reshape-transpose chains —
plus output/reduce fusions making HBM passes over the [B, nW, h, T, T]
f32 scores for bias add, mask add and softmax. The window dots themselves
are [49, 32]-class (MXU-hostile by nature), so the wins here are MEMORY
wins:

* the kernel consumes the NHWC feature map through a FREE rank-6 HBM
  reshape ``[B, H, W, C] -> [B, nH, w, nw, w, C]`` (splitting H and W is
  a view in row-major memory — no transpose) and re-windows rows inside
  VMEM, so ``window_partition``/``window_merge`` never materialize;
* scores, bias/mask adds and the softmax stay in VMEM f32; the only
  N^2-class HBM traffic is the bf16 probs tap itself when the UI asks
  for maps (same policy as ``ops/fused_block.py``);
* QKV and proj are per-strip [nw*T, C] matmuls with VMEM-resident
  weights (constant index maps), LN-to-residual fusion stays in XLA
  (the roll for shifted blocks sits between LN and the window grid, so
  the kernel's contract is the ATTENTION BRANCH: rolled LN'd map in,
  rolled branch output out — ``models/swin.py::block`` owns roll and
  residual placement).

Grid: ``(B, nH)`` — one program per (image, window-row strip). A strip is
``[w, W, C]`` = ``nw`` windows; per window the head loop is a static
unroll exactly like the ViT fused block. Relative-position bias enters as
a [heads, T, T] f32 operand (gathered at trace time — it is a parameter
expression, constant per block) and the shifted-window mask as a
[nH, nw, T, T] f32 constant sliced per strip by index map.

Reference contract: ``/root/reference/main/context.py:79-88`` (generic
per-submodule compute the swin family plugs into); semantics pinned
against ``models/swin.py::window_attention`` (the jnp ground truth) in
Pallas interpret mode (tests/test_fused_window.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from interactive_vit_tpu.ops.fused_block import _row_softmax
from interactive_vit_tpu.ops.layers import precision_for as _precision

Params = Dict[str, jnp.ndarray]


def _kernel(y_ref, qkvw_ref, qkvb_ref, projw_ref, projb_ref, bias_ref,
            *rest, heads: int, window: int, nw: int, c: int, prec,
            emit: bool, fast: bool, with_mask: bool):
    mask_ref = rest[0] if with_mask else None
    a_ref, *taps = rest[1 if with_mask else 0:]
    probs_ref = taps[0] if emit else None

    w, t = window, window * window
    xs = y_ref[0, 0]  # [w, nw, w, Cp] (lane dim 128-padded by the caller)
    cp = xs.shape[-1]
    dh = c // heads
    scale = dh ** -0.5

    # window-major rows: [w, nw, w, Cp] -> [nw, w, w, Cp] -> [nw*T, Cp].
    # The transpose permutes OUTER dims (trailing two stay (w, Cp)) and
    # the reshape collapses leading dims onto the sublane axis — Mosaic
    # lowers sublane-merging reshapes ONLY when the lane dim is a
    # multiple of 128 (probed on-chip, 2026-08-18: 8x7x7x96 -> 392x96 is
    # a tpu.reshape lowering error while 8x7x7x128 -> 392x128 works —
    # hence the caller's lane padding). Both are VMEM relayouts over
    # <1 MB strips, paid once per program instead of the XLA path's
    # HBM-sized partition/merge transposes.
    xw = xs.transpose(1, 0, 2, 3).reshape(nw * t, cp)

    # one [nw*T, Cp] @ [Cp, 3Cp] QKV matmul for the whole strip
    # (MXU-friendly row count: 392 for a 56-wide stage), f32 accumulation
    qkv = jax.lax.dot(xw, qkvw_ref[...],
                      preferred_element_type=jnp.float32, precision=prec)
    qkv = (qkv + qkvb_ref[0]).astype(xs.dtype)
    qkv3 = qkv.reshape(nw, t, qkv.shape[-1])  # window -> untiled outer dim

    for widx in range(nw):
        qkvw_ = qkv3[widx]  # [T, 3Cp] (q/k/v live in the first 3C lanes)
        houts = []
        for h in range(heads):
            q = qkvw_[:, h * dh:(h + 1) * dh]
            k = qkvw_[:, c + h * dh: c + (h + 1) * dh]
            v = qkvw_[:, 2 * c + h * dh: 2 * c + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ) * scale  # [T, T] f32, VMEM-resident
            s = s + bias_ref[h]
            if with_mask:
                # -100 on cross-region pairs of the rolled seam windows;
                # the clamp-fast softmax only clamps ABOVE (exp(-100)
                # underflows to 0 exactly as the reference intends)
                s = s + mask_ref[0, widx]
            p, r = _row_softmax(s, fast)
            if emit:
                probs = p * r
                pb = probs.astype(xs.dtype)
                probs_ref[0, 0, widx, h] = pb
                houts.append(
                    jax.lax.dot(pb, v, preferred_element_type=jnp.float32,
                                precision=prec))
            else:
                # maps-off: fold the reciprocal row-sum into the [T, dh]
                # head output — the [T, T] probs are never normalized
                o = jax.lax.dot(p.astype(v.dtype), v,
                                preferred_element_type=jnp.float32,
                                precision=prec)
                houts.append(o * r)
        o_w = jnp.concatenate(houts, axis=-1).astype(xs.dtype)  # [T, C]
        a_w = jax.lax.dot(o_w, projw_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=prec)
        a_w = (a_w + projb_ref[0]).astype(a_ref.dtype)
        # per-window write-back: [T, Cp] -> [w, w, Cp] is a sublane split
        # (lane ✕128, so it lowers); indexing the window dim needs no
        # transpose on the way out
        a_ref[0, 0, :, widx] = a_w.reshape(w, w, cp)


def fused_window_attn(
    y: jnp.ndarray,
    p: Params,
    heads: int,
    window: int,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    want_attn: bool = False,
    fast_softmax: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """W-MSA branch on an NHWC map: y [B, H, W, C] -> (a, probs|None).

    ``y`` is the LayerNorm'd (and, for shifted blocks, already rolled)
    feature map; ``a`` is the attention-branch output in the SAME (rolled)
    space — the caller un-rolls and adds the residual. Equivalent to
    ``window_merge(window_attention(window_partition(y)))`` with the
    partition/merge transposes and all HBM score passes removed.

    ``bias``: [heads, T, T] relative-position bias (f32/act dtype),
    already gathered from the (2w-1)^2 table (a trace-time constant
    expression per block). ``mask``: optional [nW, T, T] additive seam
    mask for shifted windows (numpy constant). ``probs`` is
    [B, nW, heads, T, T] in the activation dtype, bit-class-identical to
    the reference path's softmax output.
    """
    b, hres, wres, c = y.shape
    if hres % window or wres % window:
        raise ValueError(f"{hres}x{wres} map not divisible by {window}")
    nh, nw = hres // window, wres // window
    t = window * window

    # lane padding: Mosaic lowers the kernel's sublane-merging reshapes
    # only when the lane dim is a 128 multiple (on-chip probe 2026-08-18;
    # docs/kernels.md "fused window"). swin_b is already aligned; swin_t/s
    # stages 0-1 pad 96->128 / 192->256. Zero columns are exact: padded
    # qkv_w rows contribute 0, padded proj_w columns emit lanes the caller
    # slices off. XLA fuses the pad into the producing LN fusion and the
    # slice into the consuming residual add.
    cp = -(-c // 128) * 128
    c3p = -(-(3 * c) // 128) * 128
    qkv_w, qkv_b = p["qkv_w"], p["qkv_b"]
    proj_w, proj_b = p["proj_w"], p["proj_b"]
    if cp != c or c3p != 3 * c:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
        qkv_w = jnp.pad(qkv_w, ((0, cp - c), (0, c3p - 3 * c)))
        qkv_b = jnp.pad(qkv_b, (0, c3p - 3 * c))
        proj_w = jnp.pad(proj_w, ((0, 0), (0, cp - c)))
        proj_b = jnp.pad(proj_b, (0, cp - c))

    # free HBM views: splitting H and W is a reshape, not a transpose
    y6 = y.reshape(b, nh, window, nw, window, cp)

    kernel = functools.partial(
        _kernel, heads=heads, window=window, nw=nw, c=c,
        prec=_precision(y.dtype), emit=want_attn, fast=fast_softmax,
        with_mask=mask is not None,
    )

    in_specs = [
        pl.BlockSpec((1, 1, window, nw, window, cp),
                     lambda i, g: (i, g, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, c3p), lambda i, g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c3p), lambda i, g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, cp), lambda i, g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), lambda i, g: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, t, t), lambda i, g: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [
        y6, qkv_w, qkv_b.reshape(1, c3p),
        proj_w, proj_b.reshape(1, cp),
        bias.astype(jnp.float32),
    ]
    if mask is not None:
        # [nW, T, T] -> [nH, nw, T, T]: per-strip mask rows by index map
        m = jnp.asarray(mask, jnp.float32).reshape(nh, nw, t, t)
        in_specs.append(
            pl.BlockSpec((1, nw, t, t), lambda i, g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        operands.append(m)

    out_shape = [jax.ShapeDtypeStruct((b, nh, window, nw, window, cp),
                                      y.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, window, nw, window, cp),
                     lambda i, g: (i, g, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if want_attn:
        out_shape.append(
            jax.ShapeDtypeStruct((b, nh, nw, heads, t, t), y.dtype))
        out_specs.append(
            pl.BlockSpec((1, 1, nw, heads, t, t),
                         lambda i, g: (i, g, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM))

    results = pl.pallas_call(
        kernel,
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # same policy as fused_block: the default 16M scoped-vmem
            # limit is conservative (v5e has 128M physical) and a breach
            # is a deterministic COMPILE kill; fits() budgets against this
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
    )(*operands)

    a = results[0].reshape(b, hres, wres, cp)
    if cp != c:
        a = a[..., :c]
    probs = None
    if want_attn:
        probs = results[1].reshape(b, nh * nw, heads, t, t)
    return a, probs


def fits(res: int, window: int, c: int, heads: int, dtype) -> bool:
    """VMEM feasibility for one strip program, with the ~1.6x streamed
    double-buffering factor calibrated on the headwise kernel
    (docs/kernels.md scoped-vmem notes). Swin geometries are small —
    swin_b stage 3 (C=1024, 32 heads) budgets ~15 MB — but the guard
    keeps a future exotic config from hitting the deterministic
    scoped-vmem compile kill."""
    esize = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    nw = res // window
    t = window * window
    cp = -(-c // 128) * 128                   # lane-padded widths
    c3p = -(-(3 * c) // 128) * 128
    strip = window * (res // window) * window * cp * esize  # y block
    qkv_acts = nw * t * c3p * (4 + esize)     # f32 dot out + cast copy
    weights = cp * c3p * esize + c * cp * esize
    bias = heads * t * t * 4
    mask = nw * t * t * 4
    scores = t * t * 4 * 3
    probs_tap = nw * heads * t * t * esize
    streamed = 2 * strip + qkv_acts + scores + probs_tap
    total = weights + bias + mask + int(1.6 * streamed)
    return total < 48 * 1024 * 1024

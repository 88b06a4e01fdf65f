"""Weight-only int8 quantization for the serving path.

Interactive serving runs at small effective batch (1-8 concurrent graph
evals), where the TPU step is dominated by streaming weights from HBM, not
by MXU flops. Storing linear-layer weights as symmetric per-output-channel
int8 halves that traffic; activations stay bf16 and the scale is applied
AFTER the matmul (``(x @ q) * s == x @ (q * s)`` for a per-column scale),
so the dequantized weight matrix is never materialized — XLA fuses the
s8->bf16 convert into the matmul's weight read.

The reference has no quantization (CPU f32 torch end-to-end,
``/root/reference/main/context.py:79-88``); this is a TPU-native serving
extension. Accuracy caveat: per-channel weight-only int8 on ViTs is
empirically near-lossless, but this image has no pretrained weights or
eval data (zero egress), so the shipped guarantee is the *numerical*
bound tested in ``tests/test_quant.py`` (quantization error only, no
compounding surprises), not a top-1 delta. Validate on real checkpoints
before production use.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

#: key markers for a quantized-weight leaf-dict
QKEY, SKEY = "int8_q", "int8_s"


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and QKEY in w


def quantize_weight(w) -> Dict[str, jnp.ndarray]:
    """[D_in, D_out] float -> symmetric per-output-channel int8 + f32 scale.

    scale[j] = max_i |w[i, j]| / 127; q = round(w / scale), so
    |w - q * scale| <= scale/2 elementwise.
    """
    wf = np.asarray(w, np.float32)
    assert wf.ndim == 2, f"quantize_weight wants 2-D, got {wf.shape}"
    s = np.max(np.abs(wf), axis=0) / 127.0
    s = np.where(s == 0, 1.0, s)
    q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
    return {QKEY: jnp.asarray(q), SKEY: jnp.asarray(s, jnp.float32)}


def dequantize_weight(w: Dict[str, jnp.ndarray], dtype=jnp.float32):
    return (w[QKEY].astype(jnp.float32) * w[SKEY]).astype(dtype)


#: transformer-block linear weights: the standard weight-only targets.
#: First (patch embed) and last (classifier head) layers stay dense — the
#: usual int8 recipe exclusion: their error lands directly on the patch
#: features / logits, and they are a negligible share of HBM traffic.
BLOCK_WEIGHTS = frozenset({"qkv_w", "proj_w", "fc1_w", "fc2_w"})


def quantize_tree(params: Any, names: frozenset = BLOCK_WEIGHTS) -> Any:
    """Replace 2-D float weight leaves named in ``names`` with their int8
    form; everything else (norms, biases, embeddings, first/last-layer
    weights) is untouched."""

    def walk(obj: Any) -> Any:
        if isinstance(obj, dict):
            out = {}
            for k, v in obj.items():
                if (
                    k in names
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and jnp.issubdtype(v.dtype, jnp.floating)
                ):
                    out[k] = quantize_weight(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(obj, list):
            return [walk(v) for v in obj]
        if isinstance(obj, tuple):
            return tuple(walk(v) for v in obj)
        return obj

    return walk(params)

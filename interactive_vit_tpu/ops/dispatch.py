"""Kernel dispatch: pick Pallas TPU kernels or jnp reference paths.

Every hot op keeps two implementations with identical contracts (the
kernels are developed against the jnp ground truth; see ``ops/layers.py``).
Dispatch policy:

    "auto"      Pallas flash attention on TPU backends, jnp elsewhere
    "flash"     force the Pallas kernel (interpret mode off-TPU)
    "reference" force the jnp path
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001 — backend init can fail in tests
        return False


def default_attn_impl(name: str = "auto"):
    """Resolve an attention implementation by policy name.

    Returns None for the jnp reference path (``attention.mhsa`` treats None
    as "use attention_reference"), or a callable (q, k, v, want_attn) ->
    (out, probs|None).
    """
    if name == "reference":
        return None
    if name in ("auto", "flash"):
        if name == "flash" or on_tpu():
            try:
                from interactive_vit_tpu.ops.flash_attention import flash_mhsa

                return flash_mhsa
            except ImportError:
                logger.warning("flash attention unavailable; using reference")
                return None
        return None
    raise ValueError(f"unknown attention impl {name!r}")

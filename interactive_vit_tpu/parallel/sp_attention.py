"""Sequence-parallel attention as a pluggable ``attn_impl``.

Bridges ``parallel/sequence.py`` (ring + Ulysses shard_map collectives) into
the model's attention-implementation slot (``vit.forward(attn_impl=...)``),
so long-sequence scale-out composes with the rest of the stack exactly like
the Pallas kernels do:

    mesh = make_mesh({"data": 1, "model": 8})
    impl = make_sp_attn_impl(mesh, axis="model", kind="ulysses")
    out = vit.forward(params, images, cfg, want_attn=True, attn_impl=impl)

Ring cannot emit full attention maps (each device only ever holds one K/V
shard of the N x N row); a tap request on a ring impl raises with guidance
to use Ulysses (whose all-to-all keeps whole per-head maps on one chip —
the tap-friendly variant).
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from interactive_vit_tpu.parallel.sequence import (
    ring_attention,
    ulysses_attention,
)


def make_sp_attn_impl(mesh: Mesh, axis: str, kind: str = "ulysses"):
    """Build an (q, k, v, want_attn, n_real=None) -> (out, probs) impl."""
    if kind not in ("ring", "ulysses"):
        raise ValueError(f"unknown SP kind {kind!r}")

    def impl(q, k, v, want_attn: bool = False, n_real: Optional[int] = None):
        if kind == "ring":
            if want_attn:
                raise ValueError(
                    "ring attention cannot tap full attention maps (no "
                    "device holds a whole N x N row); use kind='ulysses'"
                )
            return ring_attention(q, k, v, mesh, axis=axis, n_real=n_real), None
        return ulysses_attention(q, k, v, mesh, axis=axis, n_real=n_real,
                                 want_attn=want_attn)

    return impl

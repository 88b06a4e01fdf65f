"""Example user plugin: elementwise y = s * x + t.

Demonstrates the plugin contract (module-level ``instances()``, discovered
by ``scan_plugins`` — the same discovery the reference ran over
``main/nodes/`` at import, ``/root/reference/main/context.py:154-176``).
Serve it with: ``python -m interactive_vit_tpu.serving.server
--plugin-dirs nodes``.
"""

import jax.numpy as jnp

from interactive_vit_tpu.graph.registry import NodeKind


class ScaleNode(NodeKind):
    def __init__(self):
        super().__init__("scale")

    def decode_params(self, params):
        return float(params.get("s", 1.0)), float(params.get("t", 0.0))

    def contents(self, params):
        s, t = self.decode_params(params)
        return f"{s}x + {t}"

    def io(self, params):
        return {"ins": ["o"], "outs": ["o"]}

    def fn(self, params):
        s, t = self.decode_params(params)
        return lambda ins: {"o": s * ins["o"] + t}


def instances():
    return [ScaleNode()]

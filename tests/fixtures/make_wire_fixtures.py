"""Generate the committed wire-protocol fixtures shared with the JS tests.

The frontend has never executed (no browser/node/bun in this image —
ROADMAP), so its binary codec (frontend/js/wire.js) is pinned by byte-exact
fixtures instead: the Python codec (the behavioural spec, tested against
hand-encoded bytes in test_codec.py) writes canonical request/response
messages here, and frontend/js/wire.test.mjs — runnable with plain
``node --test frontend/js`` on any machine that has node — decodes them and
checks every field against wire_fixtures.json. test_wire_fixtures.py keeps
the committed bytes in lock-step with the Python codec.

Format spec: /root/reference/main/message.py:22-127 and
/root/reference/main/static/main/nodes/net_node.js:60-80,236-248.
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Request, Response, decode_message, encode_message,
)


def build_request_bytes() -> bytes:
    """Canonical request: params, an internal edge, two tensor inputs
    (2-D + scalar-ish 1-elem), plus the taps extension."""
    g = Graph()
    a = g.add_node("cos", {"A": "2.0", "b": "0.5"})
    b = g.add_node("binop", {"op": "+"})
    g.connect(a, "o", b, "a")
    g.add_input(np.arange(12, dtype=np.float32).reshape(3, 4), a, "o")
    g.add_input(np.float32([7.0]), b, "b")
    raw = Request.encode(g)
    # splice in the taps extension (a reference-compatible JSON field)
    obj, tensors = decode_message(bytes(raw), expect_magic=REQUEST_MAGIC)
    obj["taps"] = [{"node": 1, "channel": "c"}]
    return bytes(encode_message(REQUEST_MAGIC, obj, tensors))


def build_response_bytes() -> bytes:
    outputs = {
        0: {"o": np.cos(2.0 * np.arange(12, dtype=np.float32) + 0.5)
            .reshape(3, 4)},
        1: {"c": np.float32([1.5, -2.25]),
            "attn": np.linspace(0, 1, 8, dtype=np.float32).reshape(2, 2, 2)},
    }
    return bytes(Response(outputs).encode())


def build_response_bf16_bytes() -> bytes:
    """The negotiated bf16 extension: same outputs, half-size blocks."""
    outputs = {
        0: {"o": np.float32([1.0, 2.5, -3.25])},
        1: {"attn": np.linspace(0, 1, 5, dtype=np.float32)},  # odd count:
        # exercises the pad-to-4B rule for 2-byte elements
    }
    return bytes(Response(outputs).encode(dtype="bf16"))


def expected() -> dict:
    """The decoded content both language tests assert against."""
    return {
        "request": {
            "magic": REQUEST_MAGIC,
            "nodes": [
                {"endpoint": "cos", "params": {"A": "2.0", "b": "0.5"}},
                {"endpoint": "binop", "params": {"op": "+"}},
            ],
            "tensor_dims": [[3, 4], [1]],
            "tensor_sums": [66.0, 7.0],
            "taps": [{"node": 1, "channel": "c"}],
        },
        "response": {
            "magic": 0xDEADBEEF,
            "routes": [
                {"node": 0, "channel": "o"},
                {"node": 1, "channel": "c"},
                {"node": 1, "channel": "attn"},
            ],
            "tensor_dims": [[3, 4], [2], [2, 2, 2]],
            # exact f32 values for the small blocks; sum for the big one
            "c_values": [1.5, -2.25],
            "attn_first_last": [0.0, 1.0],
        },
        "response_bf16": {
            # exactly-representable bf16 values round-trip losslessly
            "o_values": [1.0, 2.5, -3.25],
            "attn_dims": [5],
            "attn_first_last": [0.0, 1.0],
        },
    }


if __name__ == "__main__":
    with open(os.path.join(HERE, "wire_request.bin"), "wb") as f:
        f.write(build_request_bytes())
    with open(os.path.join(HERE, "wire_response.bin"), "wb") as f:
        f.write(build_response_bytes())
    with open(os.path.join(HERE, "wire_response_bf16.bin"), "wb") as f:
        f.write(build_response_bf16_bytes())
    with open(os.path.join(HERE, "wire_fixtures.json"), "w") as f:
        json.dump(expected(), f, indent=1)
    print("wire fixtures written")

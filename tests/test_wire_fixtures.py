"""Keeps the committed cross-language wire fixtures in lock-step.

The JS half (frontend/js/wire.test.mjs) cannot run in this image (no JS
runtime); this test guarantees the bytes it will decode are exactly what
the Python codec produces today, and that the Python decoder accepts the
JSON formatting a JS encoder emits (JSON.stringify writes compact
separators, json.dumps writes spaced ones — both are valid per the spec,
/root/reference/main/message.py:22-73).
"""

import json
import os
import sys

import numpy as np

from interactive_vit_tpu.wire.codec import (
    REQUEST_MAGIC, Request, decode_message, encode_message,
)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
sys.path.insert(0, FIXTURES)

import make_wire_fixtures as gen  # noqa: E402


def _read(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


def test_committed_fixtures_match_codec_output():
    assert _read("wire_request.bin") == gen.build_request_bytes(), (
        "wire_request.bin is stale — rerun tests/fixtures/make_wire_fixtures.py"
        " and re-run the JS test on a machine with node"
    )
    assert _read("wire_response.bin") == gen.build_response_bytes(), (
        "wire_response.bin is stale — rerun tests/fixtures/make_wire_fixtures.py"
    )
    with open(os.path.join(FIXTURES, "wire_fixtures.json")) as f:
        assert json.load(f) == json.loads(json.dumps(gen.expected())), (
            "wire_fixtures.json is stale"
        )


def test_fixture_request_decodes_to_expected():
    obj, tensors = decode_message(_read("wire_request.bin"),
                                  expect_magic=REQUEST_MAGIC)
    exp = gen.expected()["request"]
    assert [n["endpoint"] for n in obj["nodes"]] == \
        [n["endpoint"] for n in exp["nodes"]]
    assert obj["taps"] == exp["taps"]
    for t, dims, s in zip(tensors, exp["tensor_dims"], exp["tensor_sums"]):
        assert list(t.shape) == dims
        np.testing.assert_allclose(t.sum(), s, atol=1e-4)


def test_decoder_accepts_js_style_compact_json():
    """JSON.stringify emits no separator whitespace; the server must decode
    such requests identically (the frontend is the only request encoder in
    production)."""
    obj, tensors = decode_message(_read("wire_request.bin"),
                                  expect_magic=REQUEST_MAGIC)
    compact_json = json.dumps(obj, separators=(",", ":")).encode("utf-8")
    spaced_json = json.dumps(obj).encode("utf-8")
    assert compact_json != spaced_json  # the formats genuinely differ

    # rebuild the message byte-for-byte the way wire.js encodeMessage does
    def js_encode(json_utf8, arrays):
        import struct

        def align4(n):
            return (n + 3) & ~3

        size = align4(16 + len(json_utf8))
        blocks = b""
        for a in arrays:
            a = np.ascontiguousarray(a, dtype="<f4")
            dims = np.asarray(a.shape, dtype="<u4")
            blocks += struct.pack("<II", 8 + dims.nbytes + a.nbytes, a.ndim)
            blocks += dims.tobytes() + a.tobytes()
        size += len(blocks)
        head = struct.pack("<IIII", size, REQUEST_MAGIC, len(arrays),
                           len(json_utf8))
        pad = b"\x00" * (align4(16 + len(json_utf8)) - 16 - len(json_utf8))
        return head + json_utf8 + pad + blocks

    js_bytes = js_encode(compact_json, tensors)
    req = Request()
    req.decode(js_bytes)
    assert [n.name for n in req.graph.nodes] == ["cos", "binop"]
    assert req.taps == [(1, "c")]
    got = req.graph.nodes[0].inputs["o"].tensor
    np.testing.assert_array_equal(
        got, np.arange(12, dtype=np.float32).reshape(3, 4))


def test_fixture_roundtrip_reencodes():
    """decode -> encode -> decode is stable for both fixture messages."""
    for name, magic in [("wire_request.bin", REQUEST_MAGIC),
                        ("wire_response.bin", 0xDEADBEEF)]:
        obj, tensors = decode_message(_read(name), expect_magic=magic)
        again = encode_message(magic, obj, tensors)
        obj2, tensors2 = decode_message(bytes(again), expect_magic=magic)
        assert obj == obj2
        for a, b in zip(tensors, tensors2):
            np.testing.assert_array_equal(a, b)

"""Wire protocol tests: byte-exact fixtures of the reference format.

The fixture bytes are constructed by hand from the format spec
(``/root/reference/main/message.py:22-127``) — they are the contract.
"""

import json
import struct

import numpy as np
import pytest

from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.wire.codec import (
    REQUEST_MAGIC,
    RESPONSE_MAGIC,
    Request,
    Response,
    WireError,
    decode_message,
    encode_message,
)


def hand_encode(magic, json_obj, arrays):
    """Independent encoder written straight from the format spec."""
    json_utf8 = json.dumps(json_obj).encode()
    body = json_utf8
    pad = (-(16 + len(json_utf8))) % 4
    body += b"\x00" * pad
    for a in arrays:
        a = np.asarray(a, dtype="<f4")
        dims = np.asarray(a.shape, dtype="<u4")
        block_size = 8 + dims.nbytes + a.nbytes
        body += struct.pack("<II", block_size, len(a.shape))
        body += dims.tobytes() + a.tobytes()
    header = struct.pack("<IIII", 16 + len(body), magic, len(arrays), len(json_utf8))
    return header + body


def test_decode_hand_encoded_request():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    obj = {
        "nodes": [{"endpoint": "cos", "params": {"A": "2.0"}}],
        "edges": [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}],
    }
    raw = hand_encode(REQUEST_MAGIC, obj, [x])

    req = Request()
    req.decode(raw)
    assert len(req.graph.nodes) == 1
    assert req.graph.nodes[0].name == "cos"
    assert req.graph.nodes[0].params == {"A": "2.0"}
    got = req.graph.nodes[0].inputs["o"].tensor
    np.testing.assert_array_equal(got, x)


def test_encode_matches_hand_encoding():
    x = np.ones((2, 2), dtype=np.float32)
    obj = [{"node": 0, "channel": "o"}]
    ours = encode_message(RESPONSE_MAGIC, obj, [x])
    theirs = hand_encode(RESPONSE_MAGIC, obj, [x])
    assert ours == theirs


def test_request_roundtrip_with_internal_edges():
    g = Graph()
    a = g.add_node("cos", {"A": "1.5"})
    b = g.add_node("cos", {"b": "0.5"})
    g.connect(a, "o", b, "o")
    x = np.linspace(0, 1, 8, dtype=np.float32)
    g.add_input(x, a, "o")

    raw = Request.encode(g)
    req = Request()
    req.decode(raw)
    g2 = req.graph
    assert [n.name for n in g2.nodes] == ["cos", "cos"]
    assert g2.nodes[1].inputs["o"].src.node.index == 0
    np.testing.assert_array_equal(g2.nodes[0].inputs["o"].tensor, x)


def test_response_roundtrip():
    outs = {
        0: {"o": np.random.default_rng(0).random((2, 3)).astype(np.float32)},
        3: {"o": np.zeros((4,), np.float32), "attn": np.ones((2, 2), np.float32)},
    }
    raw = Response(outs).encode()
    back = Response.decode(raw)
    assert set(back) == {0, 3}
    np.testing.assert_array_equal(back[3]["attn"], outs[3]["attn"])
    np.testing.assert_array_equal(back[0]["o"], outs[0]["o"])


def test_bad_magic_rejected():
    raw = hand_encode(0x12345678, [], [])
    with pytest.raises(WireError):
        decode_message(raw, expect_magic=REQUEST_MAGIC)


def test_truncated_rejected():
    raw = hand_encode(REQUEST_MAGIC, {"nodes": [], "edges": []}, [np.ones(4, np.float32)])
    with pytest.raises(WireError):
        decode_message(raw[:-8], expect_magic=REQUEST_MAGIC)


def test_truncated_block_table_raises_wireerror(monkeypatch):
    """A block whose header/dims/data extend past the buffer must raise
    WireError in the pure-Python fallback too (the native scanner returns
    -3 'truncated message'), never struct.error/ValueError."""
    import interactive_vit_tpu.wire.codec as codec

    monkeypatch.setattr(codec, "_native", None)
    good = hand_encode(
        REQUEST_MAGIC, {"nodes": [], "edges": []},
        [np.ones((4,), np.float32)],
    )
    # header claims the truncated length so the byte_size check passes and
    # the block loop is what must catch the truncation
    for cut in (4, 10, 20):  # mid-data, mid-dims, mid-block-header
        bad = bytearray(good[:-cut])
        struct.pack_into("<I", bad, 0, len(bad))
        with pytest.raises(WireError, match="truncated"):
            decode_message(bytes(bad), expect_magic=REQUEST_MAGIC)
    # huge dim count: dims extent overflows the buffer
    bad = bytearray(good)
    json_end = 16 + struct.unpack_from("<I", good, 12)[0]
    blk = (json_end + 3) & ~3
    struct.pack_into("<I", bad, blk + 4, 1 << 20)
    with pytest.raises(WireError, match="truncated"):
        decode_message(bytes(bad), expect_magic=REQUEST_MAGIC)


def test_padding_alignment():
    # json sizes 0..7 exercise every padding case (message.py:13-16)
    for pad_len in range(8):
        obj = {"k": "x" * pad_len}
        raw = encode_message(REQUEST_MAGIC, obj, [np.ones((2,), np.float32)])
        back_obj, tensors = decode_message(raw, expect_magic=REQUEST_MAGIC)
        assert back_obj == obj
        np.testing.assert_array_equal(tensors[0], np.ones((2,), np.float32))


def test_scalar_tensor():
    raw = encode_message(RESPONSE_MAGIC, [], [np.float32(3.5).reshape(())])
    _, tensors = decode_message(raw, expect_magic=RESPONSE_MAGIC)
    assert tensors[0].shape == ()
    assert tensors[0] == np.float32(3.5)


def test_bf16_response_extension_roundtrip():
    """Negotiated bf16 blocks: half the bytes, tagged entries, exact
    round-trip for bf16-representable values, round-to-nearest-even for
    the rest; f32 default unchanged."""
    vals = np.linspace(-3, 3, 7, dtype=np.float32)
    big = np.random.default_rng(0).standard_normal((4, 5)).astype(np.float32)
    raw_f32 = Response({0: {"o": vals}, 1: {"m": big}}).encode()
    raw_bf16 = Response({0: {"o": vals}, 1: {"m": big}}).encode(dtype="bf16")
    assert len(raw_bf16) < len(raw_f32)

    obj, tensors = decode_message(raw_bf16, expect_magic=RESPONSE_MAGIC)
    assert all(e["dtype"] == "bf16" for e in obj)
    # decoded values equal an explicit round-to-nearest bf16 cast
    import jax.numpy as jnp

    for got, want in zip(tensors, [vals, big]):
        ref = np.asarray(jnp.asarray(want, dtype=jnp.bfloat16),
                         dtype=np.float32)
        np.testing.assert_array_equal(got, ref)

    out = Response.decode(raw_bf16)
    assert out[1]["m"].shape == (4, 5)


def test_bf16_odd_element_count_pads_to_alignment():
    """2-byte payloads with odd element counts pad to the 4B boundary so
    the next block header stays aligned."""
    raw = Response({0: {"a": np.float32([1, 2, 3])},
                    1: {"b": np.float32([4, 5])}}).encode(dtype="bf16")
    out = Response.decode(raw)
    np.testing.assert_array_equal(out[0]["a"], [1, 2, 3])
    np.testing.assert_array_equal(out[1]["b"], [4, 5])


def test_request_resp_dtype_negotiation():
    g = Graph()
    n = g.add_node("cos")
    g.add_input(np.ones(4, np.float32), n, "o")
    raw = Request.encode(g)
    obj, tensors = decode_message(bytes(raw), expect_magic=REQUEST_MAGIC)
    obj["resp_dtype"] = "bf16"
    req = Request()
    req.decode(bytes(encode_message(REQUEST_MAGIC, obj, tensors)))
    assert req.resp_dtype == "bf16"
    req2 = Request()
    req2.decode(bytes(raw))
    assert req2.resp_dtype == "f32"
    obj["resp_dtype"] = "f8"
    with pytest.raises(WireError):
        Request().decode(bytes(encode_message(REQUEST_MAGIC, obj, tensors)))

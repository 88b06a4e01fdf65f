"""Native C++ wire codec vs the pure-Python reference implementation.

The Python codec is the behavioural spec; the native path must produce
byte-identical messages and identical decode results, including every error
class. Skipped cleanly when g++/the .so is unavailable.
"""

import numpy as np
import pytest

from interactive_vit_tpu.runtime import native
from interactive_vit_tpu.wire import codec


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native runtime unavailable")
    return lib


def _python_encode(magic, obj, tensors):
    """Force the pure-Python encoder regardless of native availability."""
    saved = codec._native
    codec._native = None
    try:
        return codec.encode_message(magic, obj, tensors)
    finally:
        codec._native = saved


def test_pack_byte_identical(lib):
    rng = np.random.default_rng(0)
    tensors = [
        rng.random((3, 4)).astype(np.float32),
        rng.random((2, 2, 2)).astype(np.float32),
        np.float32(5.0).reshape(()),
        rng.random((7,)).astype(np.float32),
    ]
    obj = {"nodes": [{"endpoint": "cos", "params": {"A": "2"}}], "edges": []}
    ours = native.pack(
        codec.REQUEST_MAGIC,
        __import__("json").dumps(obj).encode(),
        tensors,
    )
    theirs = _python_encode(codec.REQUEST_MAGIC, obj, tensors)
    assert ours == theirs


def test_scan_roundtrip(lib):
    rng = np.random.default_rng(1)
    tensors = [rng.random((5, 6)).astype(np.float32) for _ in range(40)]
    obj = [{"node": i, "channel": "o"} for i in range(40)]
    raw = _python_encode(codec.RESPONSE_MAGIC, obj, tensors)

    back_obj, back_tensors = codec.decode_message(
        raw, expect_magic=codec.RESPONSE_MAGIC
    )
    assert back_obj == obj
    for a, b in zip(tensors, back_tensors):
        np.testing.assert_array_equal(a, b)


def test_scan_error_classes(lib):
    with pytest.raises(codec.WireError, match="magic"):
        codec.decode_message(b"\x00" * 64, expect_magic=codec.REQUEST_MAGIC)
    raw = _python_encode(codec.REQUEST_MAGIC, {}, [np.ones(8, np.float32)])
    with pytest.raises(codec.WireError, match="truncated|short"):
        codec.decode_message(raw[:24], expect_magic=codec.REQUEST_MAGIC)
    with pytest.raises(codec.WireError, match="short|truncated"):
        codec.decode_message(b"\x01", expect_magic=codec.REQUEST_MAGIC)


def test_scan_rejects_wrapping_data_extent(lib):
    """A crafted dims pair whose 4*elems wraps uint64 must be a
    WireError on BOTH codec paths — the wrapped extent check previously
    accepted it on the native path and numpy then raised a raw
    ValueError ('array is too big'), breaking error-class parity."""
    import struct

    json_b = b"{}"
    # block: size=0 (start+block_size==off holds exactly because the
    # forged extent wraps back to start), dims [0x80000002, 0x7FFFFFFE]
    block = struct.pack("<II", 0, 2) + struct.pack(
        "<II", 0x80000002, 0x7FFFFFFE)
    body = json_b + b"\x00" * ((-len(json_b)) % 4) + block
    raw = struct.pack("<IIII", 16 + len(body), codec.REQUEST_MAGIC,
                      1, len(json_b)) + body
    with pytest.raises(codec.WireError):
        codec.decode_message(raw, expect_magic=codec.REQUEST_MAGIC)
    saved = codec._native
    codec._native = None
    try:
        with pytest.raises(codec.WireError):
            codec.decode_message(raw, expect_magic=codec.REQUEST_MAGIC)
    finally:
        codec._native = saved


def test_fuzz_parity_with_python(lib):
    """Random messages: native decode == python decode, byte-for-byte."""
    rng = np.random.default_rng(2)
    for trial in range(20):
        k = int(rng.integers(0, 6))
        tensors = [
            rng.random(tuple(rng.integers(1, 5, size=rng.integers(1, 4)))).astype(
                np.float32
            )
            for _ in range(k)
        ]
        obj = {"x": "y" * int(rng.integers(0, 9))}
        raw_native = codec.encode_message(codec.REQUEST_MAGIC, obj, tensors)
        raw_python = _python_encode(codec.REQUEST_MAGIC, obj, tensors)
        assert raw_native == raw_python

        saved = codec._native
        try:
            o1, t1 = codec.decode_message(raw_native, codec.REQUEST_MAGIC)
            codec._native = None
            o2, t2 = codec.decode_message(raw_native, codec.REQUEST_MAGIC)
        finally:
            codec._native = saved
        assert o1 == o2
        for a, b in zip(t1, t2):
            np.testing.assert_array_equal(a, b)


def test_scan_rejects_huge_block_cnt(lib):
    """block_cnt >= 2^31 must hit the max-blocks guard, not bypass it via
    a signed cast and scribble block metadata past the fixed arrays
    (remotely triggerable heap corruption — fixed 2026-08-17)."""
    import ctypes
    import struct

    hdr = struct.pack("<IIII", 16, codec.REQUEST_MAGIC, 0xFFFFFFFF, 0)
    buf = hdr + b"\x00" * 64
    n = 1
    json_out = (ctypes.c_uint64 * 2)()
    dims_off = (ctypes.c_uint64 * n)()
    dim_cnt = (ctypes.c_uint32 * n)()
    data_off = (ctypes.c_uint64 * n)()
    elem_cnt = (ctypes.c_uint64 * n)()
    rc = lib.ivt_scan(buf, len(buf), codec.REQUEST_MAGIC, json_out,
                      dims_off, dim_cnt, data_off, elem_cnt, n)
    assert rc == -5  # too many blocks — NOT a scan past the arrays

    # and through the decode path: clean WireError, native or fallback
    with pytest.raises(codec.WireError):
        codec.decode_message(buf, expect_magic=codec.REQUEST_MAGIC)


def test_decode_rejects_overflowing_dims_product():
    """A dims list whose product wraps 2^64 (e.g. 65536^4) must raise
    WireError in the PYTHON fallback too, not leak a reshape ValueError
    (the native scanner already guards this as -4)."""
    import struct

    dims = [65536] * 4  # product == 2^64 -> wraps to 0 in u64
    block = struct.pack("<II", 8 + 16, 4) + struct.pack("<4I", *dims)
    body = b"{}" + b"\x00" * 2 + block
    raw = struct.pack("<IIII", 16 + len(body), codec.REQUEST_MAGIC, 1, 2) + body

    saved = codec._native
    try:
        codec._native = None  # force the pure-python path
        with pytest.raises(codec.WireError):
            codec.decode_message(raw, expect_magic=codec.REQUEST_MAGIC)
    finally:
        codec._native = saved
    # native path agrees
    with pytest.raises(codec.WireError):
        codec.decode_message(raw, expect_magic=codec.REQUEST_MAGIC)

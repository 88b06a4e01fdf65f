"""Vendored safetensors reader/writer: format conformance + bounds.

Round-trip behavior is also exercised by test_goldens; these are the
malformed-input and dtype-coverage contracts (a checkpoint loader is a
parser of untrusted files)."""

import json
import struct

import numpy as np
import pytest

from interactive_vit_tpu.utils.safetensors_io import (
    SafetensorsError, load_file, save_file,
)


def _write(path, header_obj, buf=b""):
    hdr = json.dumps(header_obj).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)) + hdr + buf)


def test_roundtrip_all_dtypes(tmp_path):
    p = str(tmp_path / "t.safetensors")
    tensors = {
        "f32": np.arange(6, dtype=np.float32).reshape(2, 3),
        "u32": np.arange(3, dtype=np.uint32),
        "u16": np.arange(3, dtype=np.uint16),
        "u64": np.arange(2, dtype=np.uint64),
        "i8": np.arange(4, dtype=np.int8),
        "bool": np.array([True, False]),
    }
    save_file(tensors, p)
    back = load_file(p)
    for k, v in tensors.items():
        np.testing.assert_array_equal(back[k], v)


def test_negative_offsets_rejected(tmp_path):
    """A negative start silently sliced JSON-header bytes as tensor data
    (regression)."""
    p = str(tmp_path / "bad.safetensors")
    _write(p, {"x": {"dtype": "F32", "shape": [2],
                     "data_offsets": [-8, 0]}}, b"\x00" * 8)
    with pytest.raises(SafetensorsError):
        load_file(p)


@pytest.mark.parametrize("meta", [
    {"dtype": "F32", "shape": [2], "data_offsets": [0, 3]},   # not *4
    {"dtype": "F32", "shape": [2]},                            # missing key
    {"dtype": "F32", "shape": [-2, -3], "data_offsets": [0, 24]},
    "not-a-dict",
])
def test_malformed_entries_raise_safetensors_error(tmp_path, meta):
    p = str(tmp_path / "bad.safetensors")
    _write(p, {"x": meta}, b"\x00" * 32)
    with pytest.raises(SafetensorsError):
        load_file(p)

"""ctypes bindings for the native runtime (graceful pure-Python fallback).

``get_lib()`` returns the loaded library or None; the wire codec checks it
once at import. Set ``IVT_NATIVE=0`` to force the Python paths (tests
exercise both).
"""

from __future__ import annotations

import ctypes
import logging
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_lib: Optional[ctypes.CDLL] = None
_tried = False
_load_lock = threading.Lock()

MAX_BLOCKS = 65536

_ERRORS = {
    -1: "message too short",
    -2: "bad magic",
    -3: "truncated message",
    -4: "tensor block size mismatch",
    -5: "too many tensor blocks",
}


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    with _load_lock:
        return _get_lib_locked()


def _get_lib_locked() -> Optional[ctypes.CDLL]:
    # double-checked under _load_lock: the build takes seconds of g++,
    # and setting _tried before it completes would hand a concurrent
    # first caller None — permanently caching the slow Python codec
    # path for that importer's process lifetime
    global _lib, _tried
    if _tried:
        return _lib
    if os.environ.get("IVT_NATIVE", "1") == "0":
        _tried = True
        return None
    try:
        from interactive_vit_tpu.runtime import build

        if build.is_stale():
            build.build()
        lib = ctypes.CDLL(build.SO_PATH)
        lib.ivt_scan.restype = ctypes.c_int
        lib.ivt_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.ivt_encoded_size.restype = ctypes.c_uint64
        lib.ivt_encoded_size.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.ivt_pack.restype = ctypes.c_uint64
        lib.ivt_pack.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_char_p,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        _lib = lib
        logger.info("native runtime loaded: %s", build.SO_PATH)
    except Exception as err:  # noqa: BLE001 — fallback by design
        logger.warning("native runtime unavailable (%s); using Python paths",
                       err)
        _lib = None
    _tried = True  # only after the build/load fully resolved
    return _lib


class _ScanScratch(threading.local):
    """Per-thread reusable output arrays for ``scan``.

    Allocating+zeroing five MAX_BLOCKS-entry ctypes arrays (~1.8 MB) per
    call would sit on the per-request decode hot path; thread-local (the
    ThreadingHTTPServer decodes concurrently) scratch amortizes it to one
    allocation per serving thread."""

    def __init__(self) -> None:
        n = MAX_BLOCKS
        self.json_out = (ctypes.c_uint64 * 2)()
        self.dims_off = (ctypes.c_uint64 * n)()
        self.dim_cnt = (ctypes.c_uint32 * n)()
        self.data_off = (ctypes.c_uint64 * n)()
        self.elem_cnt = (ctypes.c_uint64 * n)()


_scratch = _ScanScratch()


def scan(buf: bytes, expect_magic: int
         ) -> Tuple[Tuple[int, int], List[Tuple[int, int, int, int]]]:
    """Native block scan: returns ((json_off, json_size),
    [(dims_off, dim_cnt, data_off, elem_cnt)...]). Raises ValueError."""
    lib = get_lib()
    assert lib is not None
    if isinstance(buf, bytearray):
        buf = (ctypes.c_char * len(buf)).from_buffer(buf)  # zero-copy
    elif not isinstance(buf, bytes):
        # memoryview / other buffer: materialize once (a read-only view
        # can't be wrapped writable; offsets returned index the same
        # content either way)
        buf = bytes(buf)
    s = _scratch
    json_out = s.json_out
    dims_off, dim_cnt = s.dims_off, s.dim_cnt
    data_off, elem_cnt = s.data_off, s.elem_cnt
    n = MAX_BLOCKS
    rc = lib.ivt_scan(buf, len(buf), expect_magic, json_out, dims_off,
                      dim_cnt, data_off, elem_cnt, n)
    if rc < 0:
        raise ValueError(_ERRORS.get(rc, f"scan error {rc}"))
    blocks = [
        (dims_off[i], dim_cnt[i], data_off[i], elem_cnt[i]) for i in range(rc)
    ]
    return (json_out[0], json_out[1]), blocks


def pack(magic: int, json_utf8: bytes, tensors: List[np.ndarray]) -> bytes:
    """Native single-alloc message pack."""
    lib = get_lib()
    assert lib is not None
    tensors = [np.asarray(t, dtype=np.float32) for t in tensors]
    n = len(tensors)
    dims_arrs = [np.asarray(t.shape, dtype=np.uint32) for t in tensors]
    dim_cnt = (ctypes.c_uint32 * n)(*(d.size for d in dims_arrs))
    elem_cnt = (ctypes.c_uint64 * n)(*(t.size for t in tensors))
    dims_bytes = [d.tobytes() for d in dims_arrs]  # keep-alive
    dims_ptrs = (ctypes.c_char_p * n)(*dims_bytes)
    data_bufs = [
        t if (t.flags.c_contiguous or t.ndim == 0) else np.ascontiguousarray(t)
        for t in tensors
    ]
    data_ptrs = (ctypes.c_char_p * n)()
    for i, t in enumerate(data_bufs):
        ctypes.cast(
            ctypes.byref(data_ptrs, i * ctypes.sizeof(ctypes.c_char_p)),
            ctypes.POINTER(ctypes.c_void_p),
        ).contents.value = t.ctypes.data
    size = lib.ivt_encoded_size(len(json_utf8), dim_cnt, elem_cnt, n)
    if size > 0xFFFFFFFF:
        # ivt_pack would reject this anyway, but only AFTER we allocated
        # a >4 GB bytearray below — check the u32 framing limit first
        raise ValueError(
            f"message too large for the wire format (total {size} bytes)")
    out = bytearray(size)
    out_ref = (ctypes.c_char * size).from_buffer(out)
    written = lib.ivt_pack(out_ref, magic, json_utf8, len(json_utf8),
                           dims_ptrs, dim_cnt, data_ptrs, elem_cnt, n)
    if written == 0:
        # message or a block exceeds the u32 wire framing — fail loudly
        # like the Python encoder's struct.error, never emit wrapped sizes
        raise ValueError(
            f"message too large for the wire format (total {size} bytes)")
    assert written == size, (written, size)
    del out_ref  # release the buffer export so the bytearray is usable
    return out  # bytes-like; avoids a 2nd copy of multi-MB messages

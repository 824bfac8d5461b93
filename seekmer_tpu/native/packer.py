"""ctypes loader + streaming driver for the native FASTQ packer.

Builds libseekmer_packer.so from packer.c on first use (plain `cc`, no
pybind11 — SURVEY.md 2.1 note: C++/C via ctypes is the sanctioned native
path in this environment). Falls back to the pure-Python packer in
io/fastq.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.c")
_SO = os.path.join(_HERE, "libseekmer_packer.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-lz", "-o", _SO],
                check=True, capture_output=True, timeout=60,
            )
            return _SO
        except (FileNotFoundError, subprocess.CalledProcessError,
                subprocess.TimeoutExpired) as e:
            log.debug("native packer build with %s failed: %s", cc, e)
    return None


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = _build()
    if so is None:
        log.warning("native packer unavailable; using Python FASTQ packing")
        return None
    lib = ctypes.CDLL(so)
    lib.seekmer_pack_fastq.restype = ctypes.c_long
    lib.seekmer_pack_fastq.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.seekmer_open.restype = ctypes.c_void_p
    lib.seekmer_open.argtypes = [ctypes.c_char_p]
    lib.seekmer_next.restype = ctypes.c_long
    lib.seekmer_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long, ctypes.c_long,
    ]
    lib.seekmer_close.restype = None
    lib.seekmer_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def pack_chunk(buf: bytes, max_reads: int, max_len: int):
    """Parse complete FASTQ records from ``buf``.

    Returns (codes uint8[n, max_len], lengths int32[n], consumed_bytes).
    Raises ValueError on malformed input.
    """
    lib = get_lib()
    assert lib is not None
    codes = np.empty((max_reads, max_len), dtype=np.uint8)
    lengths = np.empty(max_reads, dtype=np.int32)
    consumed = ctypes.c_long(0)
    n = lib.seekmer_pack_fastq(
        buf, len(buf),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        max_reads, max_len, ctypes.byref(consumed),
    )
    if n < 0:
        raise ValueError("malformed FASTQ input")
    return codes[:n], lengths[:n], consumed.value


def stream_packed(path: str, max_len: int, chunk_reads: int = 16384
                  ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Stream a FASTQ(.gz) file as (codes[n, max_len], lengths[n]) chunks.

    Uses the C streaming reader: file read + gzip inflate + parse + pack
    happen inside ONE ctypes call per chunk, with the GIL released — this
    is what makes io_workers-threaded multi-file ingest scale (the Python
    gzip.read loop's per-chunk glue capped 4-thread decode at ~1.3x)."""
    lib = get_lib()
    assert lib is not None
    h = lib.seekmer_open(os.fsencode(path))
    if not h:
        raise OSError(f"cannot open FASTQ file: {path}")
    try:
        while True:
            codes = np.empty((chunk_reads, max_len), dtype=np.uint8)
            lengths = np.empty(chunk_reads, dtype=np.int32)
            n = lib.seekmer_next(
                h,
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                chunk_reads, max_len,
            )
            if n == 0:
                return
            if n == -1:
                raise ValueError(f"malformed FASTQ input in {path}")
            if n < 0:
                raise OSError(f"I/O error reading {path}")
            yield codes[:n], lengths[:n]
    finally:
        lib.seekmer_close(h)

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
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
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


def stream_packed(path: str, max_len: int, chunk_bytes: int = 4 << 20
                  ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Stream a FASTQ(.gz) file as (codes[n, max_len], lengths[n]) chunks
    using the native parser."""
    import gzip

    op = gzip.open if str(path).endswith(".gz") else open
    leftover = b""
    # generous upper bound: a record is >= 8 bytes
    with op(path, "rb") as fh:
        while True:
            chunk = fh.read(chunk_bytes)
            buf = leftover + chunk
            if not buf:
                return
            max_reads = max(len(buf) // 8, 1)
            codes, lengths, consumed = pack_chunk(buf, max_reads, max_len)
            if not chunk and consumed == 0:
                if buf.strip():
                    raise ValueError("truncated FASTQ record at end of file")
                return
            leftover = buf[consumed:]
            if codes.shape[0]:
                yield codes, lengths
            if not chunk and not leftover.strip():
                return

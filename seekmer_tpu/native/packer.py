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
    lib.seekmer_tell.restype = ctypes.c_long
    lib.seekmer_tell.argtypes = [ctypes.c_void_p]
    lib.seekmer_open_at.restype = ctypes.c_void_p
    lib.seekmer_open_at.argtypes = [ctypes.c_char_p, ctypes.c_long]
    _lib = lib
    return _lib


def _require_lib():
    lib = get_lib()
    if lib is None:
        raise RuntimeError(
            "native FASTQ packer unavailable (no working C toolchain); "
            "use the pure-Python reader path (io/fastq.batch_reads)")
    return lib


def pack_chunk(buf: bytes, max_reads: int, max_len: int):
    """Parse complete FASTQ records from ``buf``.

    Returns (codes uint8[n, max_len], lengths int32[n], consumed_bytes).
    Raises ValueError on malformed input.
    """
    lib = _require_lib()
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
    with PackedFileStream(path, max_len) as s:
        while True:
            chunk = s.next_chunk(chunk_reads)
            if chunk is None:
                return
            yield chunk


class PackedFileStream:
    """The C streaming reader as an object: ``next_chunk`` + ``tell``.

    ``tell()`` is the UNCOMPRESSED byte offset of the next unparsed
    record; ``start_offset`` reopens there (plain files: one lseek, no
    re-read; .gz: zlib decompress-and-discard inside one C call) — the
    checkpoint/resume cursor (utils/checkpoint, SURVEY.md 5.3).
    """

    def __init__(self, path: str, max_len: int, start_offset: int = 0):
        self._lib = _require_lib()
        self.path = path
        self.max_len = max_len
        if start_offset:
            self._h = self._lib.seekmer_open_at(os.fsencode(path),
                                                start_offset)
        else:
            self._h = self._lib.seekmer_open(os.fsencode(path))
        if not self._h:
            raise OSError(f"cannot open FASTQ file at offset "
                          f"{start_offset}: {path}")

    def next_chunk(self, max_reads: int):
        """(codes uint8[n, max_len], lengths int32[n]) or None at EOF."""
        codes = np.empty((max_reads, self.max_len), dtype=np.uint8)
        lengths = np.empty(max_reads, dtype=np.int32)
        n = self._lib.seekmer_next(
            self._h,
            codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_reads, self.max_len,
        )
        if n == 0:
            return None
        if n == -1:
            raise ValueError(f"malformed FASTQ input in {self.path}")
        if n < 0:
            raise OSError(f"I/O error reading {self.path}")
        return codes[:n], lengths[:n]

    def tell(self) -> int:
        return int(self._lib.seekmer_tell(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.seekmer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

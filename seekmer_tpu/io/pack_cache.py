"""Pre-packed 2-bit shard cache (SURVEY.md 7.5 item 4's named mitigation;
docs/DISTRIBUTED.md "multi-chip-host ingest").

First run over a library decodes/parses/bucket-packs as usual while
TEEING every batch — already 2-bit packed for H2D — into flat binary
files next to the FASTQ. Subsequent runs mmap those files and feed the
mapper directly: no gzip inflate, no FASTQ parse, no bucket copy, no
2-bit pack. On a multi-chip host this is what keeps per-chip utilization
from collapsing to the zlib decode rate (docs/DISTRIBUTED.md
"Consequence 1").

Layout of ``<dir>`` (default: ``<first fastq>.smpack``):
  meta.json                — version, batching config, source file
                             signatures, ordered [bucket, n_real] batch
                             list; written ATOMICALLY on clean completion,
                             so an aborted build leaves an invalid cache
                             that is simply rebuilt.
  c1_<W>.bin / bad1_<W>.bin / l1_<W>.bin   — per length bucket W: 2-bit
    code rows ((W+3)//4 B/row), invalid masks ((W+7)//8 B/row), int32
    lengths, in batch production order (batch j of bucket W = rows
    [j*B, (j+1)*B)). Paired runs add c2_/bad2_/l2_.

Batches read from the cache carry resume cursors ({"v": "pack1",
"s1": [next_batch_index, 0]}) through the SAME checkpoint plumbing as
the offset cursors (utils/checkpoint), so --checkpoint works on cached
runs; the two cursor kinds reject each other loudly.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Iterable, Iterator, List, Optional

import numpy as np

from ..config import MapConfig
from .fastq import ReadBatch

log = logging.getLogger(__name__)

VERSION = 1
CURSOR_V = "pack1"  # ReadBatch.cursor["v"] marker for cache cursors


def default_cache_dir(paths1: List[str]) -> str:
    return os.path.abspath(str(paths1[0])) + ".smpack"


def _source_sig(paths1, paths2) -> list:
    out = []
    for p in list(paths1) + list(paths2 or []):
        st = os.stat(p)
        out.append([os.path.abspath(p), st.st_size, st.st_mtime_ns])
    return out


def _cfg_sig(cfg: MapConfig, paired: bool) -> dict:
    return {
        "batch_size": cfg.batch_size,
        "length_bucket": cfg.length_bucket,
        "max_read_len": cfg.max_read_len,
        "paired": paired,
    }


def cache_valid(cache_dir: str, cfg: MapConfig, paths1, paths2) -> bool:
    """True when a complete cache matching the sources + batching config
    exists (meta.json is only written on clean completion)."""
    meta_path = os.path.join(cache_dir, "meta.json")
    try:
        with open(meta_path) as fh:
            meta = json.load(fh)
    except (OSError, ValueError):
        return False
    if meta.get("version") != VERSION:
        return False
    if meta.get("cfg") != _cfg_sig(cfg, paths2 is not None):
        return False
    try:
        if meta.get("sources") != _source_sig(paths1, paths2):
            return False
    except OSError:
        return False
    return True


def _pack2bit(codes: np.ndarray):
    from ..native.packer import pack_codes_2bit_native

    packed = pack_codes_2bit_native(codes)
    if packed is not None:
        return packed
    from ..encoding import pack_codes_2bit

    return pack_codes_2bit(codes)


class _BucketFiles:
    """Append-mode file handles for one bucket width."""

    def __init__(self, d: str, w: int, paired: bool):
        names = ["c1", "bad1", "l1"] + (["c2", "bad2", "l2"] if paired
                                        else [])
        self.fh = {n: open(os.path.join(d, f"{n}_{w}.bin"), "wb")
                   for n in names}

    def append(self, **arrays) -> None:
        for name, arr in arrays.items():
            if arr is not None:
                self.fh[name].write(np.ascontiguousarray(arr).tobytes())

    def close(self) -> None:
        for fh in self.fh.values():
            fh.close()


def write_through(batches: Iterable[ReadBatch], cache_dir: str,
                  cfg: MapConfig, paths1, paths2) -> Iterator[ReadBatch]:
    """Tee unpacked ingest batches into the cache while yielding them
    2-bit PACKED (the pack is done here once, in GIL-released C; the
    prefetch pack step no-ops on already-packed batches). meta.json is
    written only when the stream completes cleanly."""
    paired = paths2 is not None
    os.makedirs(cache_dir, exist_ok=True)
    files: dict[int, _BucketFiles] = {}
    batch_meta: list = []
    try:
        for b in batches:
            if b.pad_len is not None:
                raise ValueError("pack cache writer expects unpacked "
                                 "ingest batches")
            w = b.codes.shape[1]
            c1, bad1 = _pack2bit(b.codes)
            c2 = bad2 = None
            if b.codes2 is not None:
                c2, bad2 = _pack2bit(b.codes2)
            bf = files.get(w)
            if bf is None:
                bf = files[w] = _BucketFiles(cache_dir, w, paired)
            bf.append(c1=c1, bad1=bad1, l1=np.asarray(b.lengths, np.int32),
                      c2=c2, bad2=bad2,
                      l2=None if b.lengths2 is None
                      else np.asarray(b.lengths2, np.int32))
            batch_meta.append([int(w), int(b.n_real)])
            yield dataclasses.replace(b, codes=c1, bad=bad1, codes2=c2,
                                      bad2=bad2, pad_len=w)
    except BaseException:
        for bf in files.values():
            bf.close()
        raise
    for bf in files.values():
        bf.close()
    meta = {
        "version": VERSION,
        "cfg": _cfg_sig(cfg, paired),
        "sources": _source_sig(paths1, paths2),
        "batches": batch_meta,
    }
    tmp = os.path.join(cache_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(cache_dir, "meta.json"))
    log.info("pack cache written: %s (%d batches)", cache_dir,
             len(batch_meta))


class PackCacheSource:
    """mmap-backed batch source over a complete cache, with the same
    restore() contract as CheckpointableBatchSource (cursor = index of
    the next batch; resume skips, re-reads nothing)."""

    def __init__(self, cache_dir: str, cfg: MapConfig):
        self.dir = cache_dir
        self.cfg = cfg
        with open(os.path.join(cache_dir, "meta.json")) as fh:
            self.meta = json.load(fh)
        if self.meta.get("version") != VERSION:
            raise ValueError(f"pack cache version {self.meta.get('version')}"
                             f" != {VERSION}")
        if self.meta["cfg"]["batch_size"] != cfg.batch_size:
            raise ValueError("pack cache batch_size mismatch")
        self.paired = self.meta["cfg"]["paired"]
        self._start = 0

    def restore(self, state: dict) -> None:
        if state.get("v") != CURSOR_V:
            raise ValueError(
                "checkpoint cursor is a file-offset cursor (taken without "
                "--pack-cache); resume without --pack-cache, or delete the "
                "checkpoint to start fresh from the cache")
        if state.get("paired", False) != self.paired:
            raise ValueError("checkpoint cursor pairing does not match "
                             "the pack cache")
        self._start = int(state["s1"][0])

    def __iter__(self) -> Iterator[ReadBatch]:
        B = self.cfg.batch_size
        maps: dict[int, dict] = {}
        row_cursor: dict[int, int] = {}

        def bucket_maps(w: int) -> dict:
            m = maps.get(w)
            if m is None:
                w4, w8 = (w + 3) // 4, (w + 7) // 8
                names = {"c1": ("c1", np.uint8, w4),
                         "bad1": ("bad1", np.uint8, w8),
                         "l1": ("l1", np.int32, 0)}
                if self.paired:
                    names.update({"c2": ("c2", np.uint8, w4),
                                  "bad2": ("bad2", np.uint8, w8),
                                  "l2": ("l2", np.int32, 0)})
                m = {}
                for key, (stem, dt, cols) in names.items():
                    path = os.path.join(self.dir, f"{stem}_{w}.bin")
                    mm = np.memmap(path, dtype=dt, mode="r")
                    m[key] = (mm.reshape(-1, cols) if cols else mm)
                maps[w] = m
            return m

        batches = self.meta["batches"]
        for i, (w, n_real) in enumerate(batches):
            j = row_cursor.get(w, 0)
            row_cursor[w] = j + B
            if i < self._start:
                continue
            m = bucket_maps(w)
            sl = slice(j, j + B)
            weights = np.zeros(B, np.int32)
            weights[:n_real] = 1
            cursor = {"v": CURSOR_V, "paired": self.paired,
                      "s1": [i + 1, 0], "s2": None, "pending": {}}
            yield ReadBatch(
                codes=m["c1"][sl], lengths=np.asarray(m["l1"][sl]),
                weights=weights,
                codes2=m["c2"][sl] if self.paired else None,
                lengths2=(np.asarray(m["l2"][sl]) if self.paired else None),
                bad=m["bad1"][sl],
                bad2=m["bad2"][sl] if self.paired else None,
                pad_len=w, n_real_cached=int(n_real), cursor=cursor)

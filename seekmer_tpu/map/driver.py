"""Single-chip mapping driver: FASTQ batches -> device map step -> signature
table -> resolved EC counts (reference: seekmer mapper.py's batch pipeline +
count merge, SURVEY.md 2.1 C4/C6 and call stack 3.2).

The device step (pack -> probe -> signature -> accumulate) is one jitted
function per read-length bucket with the signature table donated, so steady
state runs with zero host<->device traffic per batch; the host only streams
and packs reads. Signature->transcript-set resolution happens once at the
end, scaling with signature diversity rather than read count.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from ..index.store import KMerIndex
from ..io.fastq import ReadBatch
from ..ops.kmer_pack import pack_canonical
from ..ops.probe import lookup_ecs, lookup_ecs_strided
from .signature import (
    SigTable,
    accumulate,
    make_sig_table,
    read_signatures,
    table_to_host,
)

log = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceIndex:
    """Index tables resident on device (or sharded across a mesh).

    A registered pytree: the table arrays are children, the geometry ints
    are static aux data, so a DeviceIndex flows through jit / shard_map
    boundaries and sharding annotations directly.
    """

    table: jnp.ndarray  # (n_buckets, 4*bucket) device layout
    stash: jnp.ndarray
    main_slots: int = dataclasses.field(metadata=dict(static=True))
    stash_slots: int = dataclasses.field(metadata=dict(static=True))
    bucket: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def from_host(cls, index: KMerIndex, device=None) -> "DeviceIndex":
        from ..ops.probe import device_table_layout

        put = functools.partial(jax.device_put, device=device)
        return cls(
            table=put(device_table_layout(index.table, index.bucket)),
            stash=put(device_table_layout(index.stash, index.bucket)),
            main_slots=index.main_slots,
            stash_slots=index.stash_slots,
            bucket=index.bucket,
            k=index.k,
        )


def merge_sig_rows(sig: np.ndarray, count: np.ndarray, total_reads: int,
                   overflow: int) -> "MapResult":
    """Merge raw signature-table rows (possibly from many chips/hosts) into
    a MapResult — the analog of the reference worker pool's join-time dict
    merge (SURVEY.md 2.1 C6), over distinct signatures."""
    occ = count > 0
    merged: Dict[tuple, int] = {}
    for row, n in zip(sig[occ], count[occ]):
        key = tuple(row.tolist())
        merged[key] = merged.get(key, 0) + int(n)
    C = sig.shape[1]
    sigs = np.array([list(k) for k in merged], dtype=np.int32).reshape(
        len(merged), C)
    counts = np.array(list(merged.values()), dtype=np.int64)
    if overflow:
        log.warning("%d mapped reads lost to signature-table overflow; "
                    "increase MapConfig.sig_table_bits", overflow)
    return MapResult(sigs=sigs, sig_counts=counts, total_reads=total_reads,
                     mapped=int(counts.sum()), overflow=overflow)


@dataclasses.dataclass
class MapResult:
    """Host-side mapping summary: distinct signatures + statistics."""

    sigs: np.ndarray  # int32[U, C] sorted EC ids padded with SIG_PAD
    sig_counts: np.ndarray  # int64[U]
    total_reads: int
    mapped: int
    overflow: int  # mapped reads lost to signature-table overflow

    @property
    def unmapped(self) -> int:
        return self.total_reads - self.mapped - self.overflow


def map_step(device_index: DeviceIndex, cfg: MapConfig, table: SigTable,
             codes, lengths, weights, codes2=None, lengths2=None) -> SigTable:
    """One device mapping step (jit-traced per bucket shape)."""
    di = device_index
    stride = cfg.probe_stride

    if cfg.pack_backend == "pallas":
        from ..em.em import _pallas_interpret
        from ..ops.pack_pallas import pack_canonical_pallas

        pack = functools.partial(pack_canonical_pallas,
                                 interpret=_pallas_interpret())
    else:
        pack = pack_canonical

    bucket_lookup = None
    if cfg.probe_backend == "pallas":
        from ..em.em import _pallas_interpret
        from ..ops.probe_pallas import make_bucket_lookup

        bucket_lookup = make_bucket_lookup(interpret=_pallas_interpret())

    if cfg.sig_backend == "pallas":
        from ..em.em import _pallas_interpret
        from ..ops.sig_pallas import read_signatures_pallas

        sig_fn = functools.partial(read_signatures_pallas,
                                   interpret=_pallas_interpret())
    else:
        sig_fn = read_signatures

    def lk(h, l, v):
        return lookup_ecs_strided(h, l, v, di.table, di.main_slots,
                                  di.stash, di.stash_slots, di.bucket,
                                  stride, chunks=cfg.probe_chunks,
                                  bucket_lookup=bucket_lookup)

    hi, lo, valid = pack(codes, lengths, di.k)
    if codes2 is not None:
        hi2, lo2, valid2 = pack(codes2, lengths2, di.k)
        P1 = hi.shape[1]
        if stride > 1:
            # strided mode fills gaps from neighboring samples' EC run
            # lengths — concatenated mates would let coverage leak across
            # the mate boundary (position P1-1/P1 are NOT adjacent genomic
            # windows), assigning wrong ECs to boundary windows. Probe
            # each mate separately.
            ecs = jnp.concatenate([lk(hi, lo, valid), lk(hi2, lo2, valid2)],
                                  axis=1)
        else:
            # dense mode: both mates through ONE lookup call (windows
            # concatenated along the position axis) so the stash round +
            # residual loop machinery is paid once per batch, not per mate
            ecs = lk(jnp.concatenate([hi, hi2], axis=1),
                     jnp.concatenate([lo, lo2], axis=1),
                     jnp.concatenate([valid, valid2], axis=1))
        valid = jnp.concatenate([valid, valid2], axis=1)
        if cfg.fusion_pairs:
            # fusion mode: keep per-mate signatures side by side so
            # discordant pairs stay resolvable (fusion.py, SURVEY C12)
            sig1, mapped1 = sig_fn(ecs[:, :P1], valid[:, :P1],
                                   cfg.max_ecs_per_read)
            sig2, mapped2 = sig_fn(ecs[:, P1:], valid[:, P1:],
                                   cfg.max_ecs_per_read)
            sig = jnp.concatenate([sig1, sig2], axis=1)
            mapped = mapped1 & mapped2
            return accumulate(table, sig, mapped, weights=weights,
                              sig_probe=cfg.sig_probe)
        # paired-end: union of mates' EC hits [BASELINE.json:8 semantics]
    else:
        ecs = lk(hi, lo, valid)
    sig, mapped = sig_fn(ecs, valid, cfg.max_ecs_per_read)
    return accumulate(table, sig, mapped, weights=weights,
                      sig_probe=cfg.sig_probe)


class Mapper:
    """Stateful single-chip mapper: feed batches, then finalize."""

    def __init__(self, index: KMerIndex, cfg: MapConfig = MapConfig(),
                 device=None):
        self.index = index
        self.cfg = cfg
        self.device_index = DeviceIndex.from_host(index, device=device)
        sig_width = cfg.max_ecs_per_read * (2 if cfg.fusion_pairs else 1)
        self.table = make_sig_table(cfg.sig_table_bits, sig_width)
        self.total_reads = 0
        self._steps: Dict[Tuple[int, bool], callable] = {}

    def _get_step(self, bucket: int, paired: bool):
        key = (bucket, paired)
        if key not in self._steps:
            cfg = self.cfg

            # device_index is a real argument, NOT a closure: closed-over
            # arrays are baked into the program as constants and would be
            # re-uploaded to the compiler with every trace (a GENCODE-scale
            # table even exceeds the remote compiler's request limit).
            def fn(di, table, *args, **kwargs):
                return map_step(di, cfg, table, *args, **kwargs)

            self._steps[key] = jax.jit(fn, donate_argnums=(1,))
        return self._steps[key]

    def feed(self, batch: ReadBatch) -> None:
        paired = batch.codes2 is not None
        step = self._get_step(batch.bucket, paired)
        kwargs = {}
        if paired:
            kwargs = dict(codes2=batch.codes2, lengths2=batch.lengths2)
        self.table = step(self.device_index, self.table, batch.codes,
                          batch.lengths, batch.weights, **kwargs)
        self.total_reads += batch.n_real

    def run(self, batches: Iterable[ReadBatch],
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 50) -> "MapResult":
        """Feed all batches; optionally checkpoint the signature table +
        read cursor every N batches (SURVEY.md 5.3: batch-granular
        restart)."""
        n = 0
        for batch in batches:
            self.feed(batch)
            n += 1
            if checkpoint_path and n % checkpoint_every == 0:
                self.save_checkpoint(checkpoint_path)
        if checkpoint_path:
            self.save_checkpoint(checkpoint_path)
        return self.finalize()

    def save_checkpoint(self, path: str) -> None:
        from ..utils.checkpoint import save_map_checkpoint

        save_map_checkpoint(path, self.table, self.total_reads,
                            {"reads_consumed": self.total_reads})

    def restore_checkpoint(self, path: str) -> Optional[dict]:
        """Restore table + counters; returns the stream cursor (how many
        reads to skip on re-feed) or None if no checkpoint exists."""
        from ..utils.checkpoint import load_map_checkpoint

        loaded = load_map_checkpoint(path)
        if loaded is None:
            return None
        self.table, self.total_reads, stream_state = loaded
        return stream_state

    def finalize(self) -> MapResult:
        sigs, counts = table_to_host(self.table)
        overflow = int(self.table.overflow)
        mapped = int(counts.sum())
        if overflow:
            log.warning(
                "%d mapped reads lost to signature-table overflow; "
                "increase MapConfig.sig_table_bits", overflow)
        return MapResult(sigs=sigs, sig_counts=counts,
                         total_reads=self.total_reads, mapped=mapped,
                         overflow=overflow)


def resolve_signatures(
    result: MapResult, index: KMerIndex
) -> Tuple[List[np.ndarray], np.ndarray, int]:
    """Distinct signatures -> final ECs (distinct transcript intersections).

    Returns (member_lists, counts, dropped); dropped = reads whose EC
    intersection is empty. Host cost scales with #distinct signatures.
    """
    agg: Dict[tuple, int] = {}
    dropped = 0
    pad = np.int32(0x7FFFFFFF)
    n_ec = (result.sigs != pad).sum(axis=1) if result.sigs.size else np.empty(0, int)

    # fast path: singleton signatures (the vast majority) ARE index ECs
    single = n_ec == 1
    for ec, n in zip(result.sigs[single, 0], result.sig_counts[single]):
        key = tuple(index.ec_members(int(ec)).tolist())
        agg[key] = agg.get(key, 0) + int(n)

    for row, n in zip(result.sigs[~single], result.sig_counts[~single]):
        ecs = row[row != pad]
        members = index.ec_members(int(ecs[0]))
        for ec in ecs[1:]:
            members = np.intersect1d(
                members, index.ec_members(int(ec)), assume_unique=True
            )
            if members.size == 0:
                break
        if members.size == 0:
            dropped += int(n)
            continue
        key = tuple(members.tolist())
        agg[key] = agg.get(key, 0) + int(n)
    member_lists = [np.array(m, dtype=np.int32) for m in agg]
    counts = np.array(list(agg.values()), dtype=np.float64)
    return member_lists, counts, dropped

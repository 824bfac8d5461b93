"""P2 — prefix-sharded k-mer index with all_to_all read routing
(SURVEY.md 2.2, BASELINE config 4 [BASELINE.json:10]).

The k-mer table is partitioned by the TOP bits of the slot hash (the "k-mer
prefix" in hash space, giving near-perfectly balanced shards); each device
holds 1/D of the table (the tensor/model-parallel analog for this workload,
and the routing is expert-parallel-shaped: prefix owner = expert id,
all_to_all dispatch/return).

Per device step under shard_map (read batch sharded over BOTH mesh axes,
index sharded over the `index` axis):

  1. pack local reads' canonical k-mers (both mates' windows concatenated
     for paired-end); owner = top log2(D) hash bits;
  2. sort lanes by owner, scatter into a (D, K) routing buffer (capacity
     factor bounds K; lanes ranked past K drain through further rounds —
     routing is EXACT, capacity only trades memory for latency);
  3. lax.all_to_all along `index` dispatches queries to their owners;
  4. owners probe their local table shard (same low-bit slot hash);
  5. reverse all_to_all returns EC ids; unscatter to original lanes;
  6. signature extraction + accumulation proceed exactly as in the
     replicated-index path.

No reference counterpart: the reference index is a single in-process hash
table (SURVEY.md 2.1 C2).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MapConfig, ShardConfig
from ..index.build import _next_pow2, build_bucket_table
from ..index.store import EMPTY, KMerIndex
from ..io.fastq import ReadBatch
from ..map.driver import MapResult, merge_sig_rows
from ..map.signature import (SigTable, fold_batch, make_sig_table,
                             read_signatures)
from ..ops.hash import hash_kmer, hash_kmer_stash
from ..ops.kmer_pack import pack_canonical
from ..ops.probe import lookup_ecs
from .mesh import make_mesh

log = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedDeviceIndex:
    """Per-shard tables stacked on a leading axis sharded over `index`."""

    table: jnp.ndarray  # int32[D, n_buckets, 4*bucket] (device layout)
    stash: jnp.ndarray  # int32[D, n_stash_buckets, 4*bucket]
    main_slots: int = dataclasses.field(metadata=dict(static=True))
    stash_slots: int = dataclasses.field(metadata=dict(static=True))
    bucket: int = dataclasses.field(metadata=dict(static=True))
    k: int = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))


def _occupied_keys(table: np.ndarray):
    occ = table[:, 0] != EMPTY
    return table[occ, 0], table[occ, 1], table[occ, 2], table[occ, 3]


def shard_index_by_prefix(
    index: KMerIndex, n_shards: int, load_factor: float = 0.5,
    return_fld_shard0: bool = False,
):
    """Rebuild the flat index as n_shards prefix-partitioned sub-tables.

    Owner of a key = top log2(n_shards) bits of its main slot hash, so the
    same hash computed on device routes queries; the low bits address the
    home bucket within the owner's table (hash bits are independent).

    ``return_fld_shard0`` additionally returns
    (shard0_table_host, fld_tid0, fld_pos0) — shard 0's device-layout
    table plus its per-slot FLD payload (map/fld.py). Shard membership is
    a hash of the k-mer, so shard 0's keys are an UNBIASED 1/n_shards
    sample of the index: fragment-length estimation can run against this
    one sub-table on a single device (an owner==0 filter on the sampled
    windows) instead of needing the full replicated table.
    """
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
    hi1, lo1, v1, a1 = _occupied_keys(index.table)
    hi2, lo2, v2, a2 = _occupied_keys(index.stash)
    hi = np.concatenate([hi1, hi2])
    lo = np.concatenate([lo1, lo2])
    val = np.concatenate([v1, v2])
    aux = np.concatenate([a1, a2])
    fld_key = None
    if return_fld_shard0:
        if index.fld_tid is None:
            raise ValueError("index has no FLD payload")
        occ1 = index.table[:, 0] != EMPTY
        occ2 = index.stash[:, 0] != EMPTY
        S1 = index.main_slots
        fld_key = (
            np.concatenate([index.fld_tid[:S1][occ1],
                            index.fld_tid[S1:][occ2]]),
            np.concatenate([index.fld_pos[:S1][occ1],
                            index.fld_pos[S1:][occ2]]),
        )
    G = index.bucket

    h = hash_kmer(hi.view(np.uint32), lo.view(np.uint32))
    # n_shards = 2**b: owner = top b bits of the slot hash
    b = int(np.log2(n_shards))
    owner = (h >> np.uint32(32 - b)).astype(np.int64) if b else np.zeros(hi.size, np.int64)

    max_n = max(int((owner == d).sum()) for d in range(n_shards)) if hi.size else 1
    n_buckets = _next_pow2(max(int(np.ceil(max_n / (load_factor * G))), 2))

    def build_shard(m, stash_buckets):
        t, over = build_bucket_table(hi[m], lo[m], val[m], n_buckets, G,
                                     hash_kmer, aux=aux[m])
        while True:
            st, s_over = build_bucket_table(
                hi[m][over], lo[m][over], val[m][over], stash_buckets, G,
                hash_kmer_stash, aux=aux[m][over])
            if not s_over.any():
                return t, st, stash_buckets
            stash_buckets *= 2

    tables, stashes, parts = [], [], []
    stash_buckets = _next_pow2(max(1024 // G, 2))
    for d in range(n_shards):
        m = owner == d
        t, st, stash_buckets = build_shard(m, stash_buckets)
        tables.append(t)
        stashes.append(st)
        parts.append(int(m.sum()))
    # rebuild earlier shards if the stash grew mid-way (uniform shapes)
    for d in range(n_shards):
        if stashes[d].shape[0] != stash_buckets * G:
            t, st, _ = build_shard(owner == d, stash_buckets)
            tables[d], stashes[d] = t, st
    log.info("prefix shards: %s keys/shard, %d buckets each", parts, n_buckets)

    fld0 = None
    if return_fld_shard0:
        # re-place shard 0's keys to recover slot->key mapping for its
        # FLD payload (main-table part only; stash-resident keys are
        # simply never sampled, as in the replicated estimator)
        m = owner == 0
        t0, over0, slot0, src0 = build_bucket_table(
            hi[m], lo[m], val[m], n_buckets, G, hash_kmer, aux=aux[m],
            return_placement=True)
        idx0 = np.flatnonzero(m)
        fld_tid0 = np.full(n_buckets * G, -1, np.int32)
        fld_pos0 = np.zeros(n_buckets * G, np.int32)
        fld_tid0[slot0] = fld_key[0][idx0[src0]]
        fld_pos0[slot0] = fld_key[1][idx0[src0]]

    # at-rest device layout: (D, n_buckets, 4*G) slab rows — 128-int32
    # tile rows, [hi|lo|ecaux|meta] slabs (ops/probe.device_table_layout)
    from ..ops.probe import device_table_layout

    tables = [device_table_layout(t, G) for t in tables]
    stashes = [device_table_layout(t, G) for t in stashes]
    sdi = ShardedDeviceIndex(
        table=jnp.asarray(np.stack(tables)),
        stash=jnp.asarray(np.stack(stashes)),
        main_slots=n_buckets * G,
        stash_slots=stash_buckets * G,
        bucket=G,
        k=index.k,
        n_shards=n_shards,
    )
    if return_fld_shard0:
        return sdi, (tables[0], fld_tid0, fld_pos0)
    return sdi


def routed_lookup(hi, lo, valid, sdi: ShardedDeviceIndex, axis: str,
                  capacity: int):
    """Distributed EC lookup: dispatch (hi, lo) lanes to prefix owners along
    ``axis``, probe the local shard, return results. Runs inside shard_map;
    the local table block has a leading singleton axis.

    EXACT under capacity pressure: each round routes at most ``capacity``
    lanes per owner; lanes ranked past the capacity drain through further
    all_to_all rounds (the residual-rounds pattern of ops/probe's stash
    path) instead of being dropped. The continue condition is psum-agreed
    over ``axis`` so every shard executes the same number of collective
    rounds — a per-shard condition would deadlock the all_to_all.

    Returns (ecs int32[B, P], extra_rounds int32[]) — extra_rounds > 0
    flags capacity pressure (a latency signal, never a correctness one).
    """
    B, Pp = hi.shape
    N = B * Pp
    D = sdi.n_shards
    b = int(np.log2(D))
    hi_f, lo_f, valid_f = hi.reshape(N), lo.reshape(N), valid.reshape(N)

    h = hash_kmer(hi_f.astype(jnp.uint32), lo_f.astype(jnp.uint32))
    owner = (h >> np.uint32(32 - b)).astype(jnp.int32) if b else jnp.zeros(N, jnp.int32)
    owner = jnp.where(valid_f, owner, D)  # invalid lanes route nowhere

    idx = jnp.arange(N, dtype=jnp.int32)
    owner_s, hi_s, lo_s, idx_s = jax.lax.sort(
        [owner, hi_f, lo_f, idx], num_keys=1)
    # rank within owner group
    pos = jnp.arange(N, dtype=jnp.int32)
    first = jnp.ones(N, bool).at[1:].set(owner_s[1:] != owner_s[:-1])
    group_start = jnp.where(first, pos, 0)
    group_start = jax.lax.associative_scan(jnp.maximum, group_start)
    rank = pos - group_start

    K = capacity
    dump = D * K  # one dump row appended
    shape = (D, K)
    routable = owner_s < D
    table = sdi.table[0]  # local shard (leading axis singleton in shard_map)
    stash = sdi.stash[0]

    def one_round(ecs, base):
        """Route lanes ranked [base, base+K) per owner; write their ECs."""
        ok = routable & (rank >= base) & (rank < base + K)
        dest = jnp.where(ok, owner_s * K + (rank - base), dump)
        send_hi = jnp.zeros(D * K + 1, jnp.int32).at[dest].set(hi_s)
        send_lo = jnp.zeros(D * K + 1, jnp.int32).at[dest].set(lo_s)
        send_valid = jnp.zeros(D * K + 1, bool).at[dest].set(ok)
        ret_idx = jnp.zeros(D * K + 1, jnp.int32).at[dest].set(idx_s)

        q_hi = jax.lax.all_to_all(send_hi[: D * K].reshape(shape), axis,
                                  0, 0, tiled=True).reshape(D * K)
        q_lo = jax.lax.all_to_all(send_lo[: D * K].reshape(shape), axis,
                                  0, 0, tiled=True).reshape(D * K)
        q_valid = jax.lax.all_to_all(send_valid[: D * K].reshape(shape),
                                     axis, 0, 0, tiled=True).reshape(D * K)

        ec_q = lookup_ecs(q_hi, q_lo, q_valid, table, sdi.main_slots,
                          stash, sdi.stash_slots, sdi.bucket)
        ec_back = jax.lax.all_to_all(ec_q.reshape(shape), axis, 0, 0,
                                     tiled=True).reshape(D * K)

        # unscatter this round's lanes to original order
        src = jnp.where(send_valid[: D * K], ret_idx[: D * K], N)
        return ecs.at[src].set(ec_back)

    ecs = one_round(jnp.full(N + 1, -1, jnp.int32), jnp.int32(0))

    def cond(state):
        _, base = state
        more = jnp.any(routable & (rank >= base)).astype(jnp.int32)
        return jax.lax.psum(more, axis) > 0

    def body(state):
        ecs, base = state
        return one_round(ecs, base), base + jnp.int32(K)

    ecs, end_base = jax.lax.while_loop(cond, body, (ecs, jnp.int32(K)))
    extra_rounds = (end_base // jnp.int32(K)) - 1
    return ecs[:N].reshape(B, Pp), extra_rounds


class PrefixShardedMapper:
    """Mapper for the prefix-sharded index mode (config 4): reads sharded
    over both mesh axes, index sharded over `index`, queries routed with
    all_to_all."""

    def __init__(
        self,
        index: KMerIndex,
        cfg: MapConfig = MapConfig(),
        shard_cfg: ShardConfig = ShardConfig(index_mode="prefix"),
        mesh: Mesh = None,
        capacity_factor: float = 2.0,
    ):
        if cfg.probe_sample >= 2 and cfg.sample_fallback_frac == 0:
            # auto cap-sizing needs a host readback the shard_map step
            # does not do (map/driver.Mapper calibrates); fixed default
            log.info("fast-mode fallback cap: auto (sample_fallback_frac"
                     "=0) resolves to 0.125 under prefix sharding — pass "
                     "an explicit value to tune (see config.py)")
        self.index = index
        self.cfg = cfg
        self.shard_cfg = shard_cfg
        self.mesh = mesh if mesh is not None else make_mesh(shard_cfg)
        self.n_index = self.mesh.shape[shard_cfg.index_axis_name]
        self.n_data = self.mesh.shape[shard_cfg.data_axis_name]
        self.n_dev = self.n_index * self.n_data
        if cfg.batch_size % self.n_dev:
            raise ValueError(
                f"global batch {cfg.batch_size} not divisible by "
                f"{self.n_dev} devices")
        self.capacity_factor = capacity_factor

        self._fld_shard0 = None
        if index.fld_tid is not None:
            sdi_host, self._fld_shard0 = shard_index_by_prefix(
                index, self.n_index, return_fld_shard0=True)
        else:
            sdi_host = shard_index_by_prefix(index, self.n_index)
        ispec = P(shard_cfg.index_axis_name)
        self.sdi = ShardedDeviceIndex(
            table=self._put_global(sdi_host.table, ispec),
            stash=self._put_global(sdi_host.stash, ispec),
            main_slots=sdi_host.main_slots,
            stash_slots=sdi_host.stash_slots,
            bucket=sdi_host.bucket,
            k=sdi_host.k,
            n_shards=sdi_host.n_shards,
        )
        both = (shard_cfg.data_axis_name, shard_cfg.index_axis_name)
        self.both_axes = both
        local = make_sig_table(cfg.sig_table_bits, cfg.max_ecs_per_read,
                               num_ecs=0 if cfg.fusion_pairs
                               else index.num_ecs)

        def tile0(x):
            x = np.asarray(x)
            return np.tile(x, (self.n_dev,) + (1,) * (x.ndim - 1))

        bspec = P(both)
        self.table = SigTable(
            key=self._put_global(tile0(local.key), bspec),
            count=self._put_global(tile0(local.count), bspec),
            sig=self._put_global(tile0(local.sig), bspec),
            overflow=self._put_global(np.zeros(self.n_dev, np.int32), bspec),
            collisions=self._put_global(
                np.zeros(self.n_dev, np.int32), bspec),
            ec_count=self._put_global(tile0(local.ec_count), bspec),
        )
        self.total_reads = 0
        self._ckpt_step = 0
        self._fed_batches = 0
        # running device-side max of per-batch extra routing rounds: no
        # per-feed sync, O(1) buffers (a list of per-batch arrays grew
        # with run length)
        self._rounds_max = jnp.zeros((), jnp.int32)
        self._steps: Dict[Tuple[int, bool, bool], callable] = {}

    def _get_step(self, bucket: int, paired: bool, audit: bool = True):
        key = (bucket, paired, audit)
        if key in self._steps:
            return self._steps[key]
        cfg, shard_cfg, mesh = self.cfg, self.shard_cfg, self.mesh
        iaxis = shard_cfg.index_axis_name
        both = self.both_axes
        B_local = cfg.batch_size // self.n_dev
        Pp = bucket - self.index.k + 1
        lanes_local = B_local * Pp * (2 if paired else 1)
        K = int(np.ceil(lanes_local / self.n_index * self.capacity_factor))
        sdi = self.sdi

        sample_mode = (cfg.probe_sample >= 2 and cfg.probe_stride <= 1
                       and not cfg.fusion_pairs)
        fb_frac = cfg.sample_fallback_frac or 0.125
        cf = self.capacity_factor
        n_index = self.n_index

        def local_step(sdi, table, codes, lengths, weights,
                       codes2=None, lengths2=None):
            t = SigTable(table.key, table.count, table.sig, table.overflow[0],
                         table.collisions[0], table.ec_count)
            hi, lo, valid = pack_canonical(codes, lengths, sdi.k)
            seg_widths = [hi.shape[1]]
            segments = [(codes, lengths)]
            if codes2 is not None:
                # paired-end: both mates route through ONE dispatch
                # (windows concatenated along the position axis, exactly
                # as the replicated path does, map/driver.py) — union-of-
                # mates signature semantics [BASELINE.json:8]
                hi2, lo2, valid2 = pack_canonical(codes2, lengths2, sdi.k)
                hi = jnp.concatenate([hi, hi2], axis=1)
                lo = jnp.concatenate([lo, lo2], axis=1)
                valid = jnp.concatenate([valid, valid2], axis=1)
                seg_widths.append(hi2.shape[1])
                segments.append((codes2, lengths2))
            if sample_mode:
                # SAMPLED ROUTING (round-5 verdict Missing #5's real
                # target): phase 1 routes only every probe_sample-th
                # window through the all_to_all — a ~stride-fold cut of
                # the comms model's dominant routed-bytes term
                # (docs/DISTRIBUTED.md C4) — and ambiguous (read, mate)
                # units re-route DENSELY in capped collective rounds.
                # Each lookup's routing capacity derives from ITS lane
                # count (phase 1 is stride-fold smaller, phase-2 rounds
                # are capu*windows). The fallback residual loop's
                # continue flag is psum-agreed over the index axis so
                # every shard runs the same number of all_to_all rounds
                # (a local condition would deadlock the collective);
                # extra-routing-rounds telemetry is not tracked in this
                # mode (the dense path keeps it).
                from ..map.signature import SIG_PAD
                from ..ops.probe import two_phase_signatures

                def lk_routed(h, l, v, chunks=1):
                    del chunks  # routing capacity bounds the transient
                    Kc = int(np.ceil(h.shape[0] * h.shape[1] / n_index
                                     * cf))
                    ecs_, _ = routed_lookup(h, l, v, sdi, iaxis, Kc)
                    return ecs_

                sig, mapped = two_phase_signatures(
                    hi, lo, valid, segments,
                    lambda c, ln: pack_canonical(c, ln, sdi.k),
                    None, 0, None, 0, sdi.bucket, cfg.probe_sample,
                    cfg.max_ecs_per_read, read_signatures, int(SIG_PAD),
                    fallback_frac=fb_frac, seg_widths=seg_widths,
                    lookup_fn=lk_routed,
                    residual_agree=lambda m: jax.lax.psum(
                        m.astype(jnp.int32), iaxis) > 0)
                extra = jnp.zeros((), jnp.int32)
            else:
                ecs, extra = routed_lookup(hi, lo, valid, sdi, iaxis, K)
                sig, mapped = read_signatures(ecs, valid,
                                              cfg.max_ecs_per_read)
            t = fold_batch(t, sig, mapped, weights=weights,
                           sig_probe=cfg.sig_probe, audit=audit)
            return (SigTable(t.key, t.count, t.sig, t.overflow[None],
                             t.collisions[None], t.ec_count),
                    extra[None])

        dspec = P(both)
        sdi_spec = ShardedDeviceIndex(
            table=P(iaxis), stash=P(iaxis),
            main_slots=sdi.main_slots, stash_slots=sdi.stash_slots,
            bucket=sdi.bucket, k=sdi.k, n_shards=sdi.n_shards,
        )
        tab_spec = SigTable(key=dspec, count=dspec, sig=dspec, overflow=dspec,
                            collisions=dspec, ec_count=dspec)
        n_data = 5 + (2 if paired else 0)

        sm = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(sdi_spec, tab_spec) + (dspec,) * (n_data - 2),
            out_specs=(tab_spec, dspec),
            check_vma=False,
        )
        step = jax.jit(sm, donate_argnums=(1,))
        self._steps[key] = step
        return step

    def _put_global(self, arr, spec):
        """Place a host-replicated array with the given PartitionSpec.
        Multi-process: every process holds the full host array (the index
        and the zero-initialized tables are built identically everywhere),
        so each process materializes its addressable shards by slicing
        (ckpt_mp.place_global)."""
        from .ckpt_mp import place_global

        return place_global(arr, NamedSharding(self.mesh, spec))

    def _put_batch(self, arr):
        """Place a batch array sharded over BOTH mesh axes (flattened on
        dim 0). Multi-process: each host passes its LOCAL slice of the
        global batch (BASELINE config 4 is multi-HOST: per-host FASTQ
        shards route queries across the process boundary through the
        all_to_all) and the global array is assembled across processes —
        the DP mapper's pattern (data_parallel.py _put_batch)."""
        dspec = NamedSharding(self.mesh, P(self.both_axes))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(dspec, arr)
        return jax.device_put(arr, dspec)

    def feed(self, batch: ReadBatch) -> None:
        if batch.pad_len is not None:
            raise ValueError(
                "2-bit-packed batches are single-chip-mapper only; feed "
                "unpacked rows (device_put_batches(pack_2bit=False))")
        from ..map.driver import audit_this_batch

        paired = batch.codes2 is not None
        step = self._get_step(batch.bucket, paired,
                              audit_this_batch(self.cfg, self._fed_batches))
        self._fed_batches += 1
        put = self._put_batch
        args = [put(batch.codes), put(batch.lengths), put(batch.weights)]
        if paired:
            args += [put(batch.codes2), put(batch.lengths2)]
        self.table, extra = step(self.sdi, self.table, *args)
        self.total_reads += batch.n_real
        # async device-side fold; read back at finalize. Multi-process:
        # eager reductions over a non-fully-addressable global array are
        # disallowed, so fold only this process's addressable shards (the
        # property below allgather-maxes at read time).
        if jax.process_count() > 1:
            d0 = jax.local_devices()[0]
            for s in extra.addressable_shards:
                # shards sit on different local devices; hop each scalar
                # to one device (async) so the fold stays sync-free
                self._rounds_max = jnp.maximum(
                    self._rounds_max,
                    jax.device_put(jnp.max(s.data).astype(jnp.int32), d0))
        else:
            self._rounds_max = jnp.maximum(self._rounds_max,
                                           extra.max().astype(jnp.int32))

    def run(self, batches: Iterable[ReadBatch],
            checkpoint_path: str = None,
            checkpoint_every: int = 50) -> MapResult:
        from ..map.driver import _run_with_checkpoints

        return _run_with_checkpoints(self, batches, checkpoint_path,
                                     checkpoint_every)

    def save_checkpoint(self, path: str, stream_state=None) -> None:
        """Checkpoint the sharded signature table + resume cursor — the
        DP mapper's protocol (parallel/ckpt_mp.py), table sharded over
        BOTH mesh axes."""
        from .ckpt_mp import save_mapper_checkpoint

        save_mapper_checkpoint(self, path, stream_state)

    def supports_checkpoint(self) -> bool:
        return True

    def restore_checkpoint(self, path: str):
        """Restore the sharded table (re-placed with this mapper's
        both-axes data sharding); returns the stream cursor — this HOST's
        cursor on multi-process runs — ({} when the checkpoint carries
        none) or None if no checkpoint exists."""
        from .ckpt_mp import restore_mapper_checkpoint

        return restore_mapper_checkpoint(
            self, path, NamedSharding(self.mesh, P(self.both_axes)))

    def make_fld_estimator(self):
        """FLD estimator over prefix-shard 0's sub-table — an unbiased
        1/n_shards key sample, matched on the default device with an
        owner==0 window filter (map/fld.FLDEstimator.for_prefix_shard0)."""
        if self._fld_shard0 is None:
            return None
        from ..map.fld import FLDEstimator

        table0, fld_tid0, fld_pos0 = self._fld_shard0
        return FLDEstimator.for_prefix_shard0(
            self.index, table0, fld_tid0, fld_pos0, self.n_index)

    @property
    def extra_routing_rounds(self) -> int:
        """Max extra all_to_all rounds any batch needed (capacity
        pressure; syncs the running device fold; multi-process, maxes
        across hosts)."""
        v = int(np.asarray(self._rounds_max))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            v = int(multihost_utils.process_allgather(np.int32(v)).max())
        return v

    def _host(self, x) -> np.ndarray:
        """Pull a mesh-sharded array to host; multi-process, shards are
        allgathered so every host sees the global table."""
        from .ckpt_mp import allgather_host

        return allgather_host(x)

    def finalize(self) -> MapResult:
        if self.extra_routing_rounds:
            log.info("all_to_all capacity pressure: up to %d extra routing "
                     "round(s) per batch (results exact; raise "
                     "capacity_factor to trade memory for latency)",
                     self.extra_routing_rounds)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # per-host read counters -> global total (DP finalize pattern)
            self.total_reads = int(multihost_utils.process_allgather(
                np.int64(self.total_reads)).sum())
        sig = self._host(self.table.sig)
        count = self._host(self.table.count).astype(np.int64)
        ec = self._host(self.table.ec_count)
        if ec.size > self.n_dev:  # real per-chip direct vectors
            from ..map.signature import direct_rows

            ec_sum = ec.reshape(self.n_dev, -1).sum(axis=0)
            drows, dcounts = direct_rows(ec_sum, sig.shape[1])
            if drows.shape[0]:
                sig = np.concatenate([sig, drows])
                count = np.concatenate([count, dcounts])
        return merge_sig_rows(sig, count,
                              self.total_reads,
                              int(self._host(self.table.overflow).sum()),
                              collisions=int(
                                  self._host(self.table.collisions).sum()))

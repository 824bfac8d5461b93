"""Loop-free bucketized k-mer lookup on device.

Replaces the reference mapper's per-k-mer hash-probe walk (SURVEY.md call
stack 3.3) with a design driven by the measured TPU gather cost model
(benchmarks/micro_gather.py): gathers cost per-LANE, independent of row
width up to 64B+. The index therefore guarantees every key lives in its
home bucket of the main table OR its home bucket of the stash
(index/build.py), so a lookup is:

  1. ONE gather of the 16-slot home bucket + vectorized compare;
  2. for the rare lanes whose main bucket was full and had no match
     (typically <2%), a cumsum-compacted second gather of the stash bucket.

Absence needs no empty-slot scanning: no match in both home buckets proves
the key is not indexed. No while_loop, no probe rounds — pure static
dataflow that XLA pipelines freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hash import hash_kmer, hash_kmer_stash

EMPTY = jnp.int32(-1)
MISS = jnp.int32(-1)


def _bucket_lookup(hi, lo, table, slots: int, bucket: int, hash_fn):
    """One bucket gather + compare. hi/lo: int32[N].

    Returns (ec int32[N] (MISS if absent), found bool[N], full bool[N]) —
    ``full`` marks lanes whose home bucket has no empty slot (lookup must
    consult the stash when not found).
    """
    nb = slots // bucket
    hb = (hash_fn(hi.astype(jnp.uint32), lo.astype(jnp.uint32))
          & jnp.uint32(nb - 1)).astype(jnp.int32)
    rows = table.reshape(nb, bucket * 4)[hb].reshape(-1, bucket, 4)
    match = (rows[:, :, 0] == hi[:, None]) & (rows[:, :, 1] == lo[:, None])
    ec = jnp.max(jnp.where(match, rows[:, :, 2], MISS), axis=1)
    found = match.any(axis=1)
    full = (rows[:, :, 0] != EMPTY).all(axis=1)
    return ec, found, full


def lookup_ecs(
    hi,
    lo,
    valid,
    table,
    main_slots: int,
    stash,
    stash_slots: int,
    bucket: int,
):
    """k-mer (hi, lo) lanes -> EC ids (MISS = -1 for absent/invalid).

    Accepts any lane shape; flattens internally. The stash pass runs on a
    cumsum-compacted N/4 sub-array (overflow lanes beyond that cap — never
    seen in practice — are conservatively counted as misses).
    """
    shape = hi.shape
    hi_f = hi.reshape(-1)
    lo_f = lo.reshape(-1)
    valid_f = valid.reshape(-1)
    N = hi_f.shape[0]

    ec, found, full = _bucket_lookup(hi_f, lo_f, table, main_slots, bucket,
                                     hash_kmer)
    ec = jnp.where(valid_f & found, ec, MISS)

    need_stash = valid_f & ~found & full
    # cumsum-compact the stash lanes: rank < N2 participate
    N2 = max(N // 4, 64)
    rank = jnp.cumsum(need_stash.astype(jnp.int32)) - 1
    ok = need_stash & (rank < N2)
    pos = jnp.where(ok, rank, N2)
    c_hi = jnp.zeros(N2 + 1, jnp.int32).at[pos].set(hi_f, mode="drop")
    c_lo = jnp.zeros(N2 + 1, jnp.int32).at[pos].set(lo_f, mode="drop")
    idx = jnp.arange(N, dtype=jnp.int32)
    c_src = jnp.full(N2 + 1, N, jnp.int32).at[pos].set(
        jnp.where(ok, idx, N), mode="drop")

    ec2, found2, _ = _bucket_lookup(c_hi[:N2], c_lo[:N2], stash, stash_slots,
                                    bucket, hash_kmer_stash)
    ec_ext = jnp.concatenate([ec, jnp.zeros(1, jnp.int32)])
    src = jnp.where(found2, c_src[:N2], N)
    ec_ext = ec_ext.at[src].set(jnp.where(found2, ec2, 0), mode="drop")
    return ec_ext[:N].reshape(shape)

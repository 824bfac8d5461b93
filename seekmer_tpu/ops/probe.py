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

    Returns (ec, aux, found, full): ec int32[N] (MISS if absent), aux
    int32[N] (the matched row's aux column, e.g. EC run length; 0 if
    absent), ``full`` marks lanes whose home bucket has no empty slot
    (lookup must consult the stash when not found).
    """
    nb = slots // bucket
    hb = (hash_fn(hi.astype(jnp.uint32), lo.astype(jnp.uint32))
          & jnp.uint32(nb - 1)).astype(jnp.int32)
    rows = table.reshape(nb, bucket * 4)[hb].reshape(-1, bucket, 4)
    match = (rows[:, :, 0] == hi[:, None]) & (rows[:, :, 1] == lo[:, None])
    ec = jnp.max(jnp.where(match, rows[:, :, 2], MISS), axis=1)
    aux = jnp.max(jnp.where(match, rows[:, :, 3], 0), axis=1)
    found = match.any(axis=1)
    full = (rows[:, :, 0] != EMPTY).all(axis=1)
    return ec, aux, found, full


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
    ec, _ = lookup_ecs_aux(hi, lo, valid, table, main_slots, stash,
                           stash_slots, bucket)
    return ec


def lookup_ecs_aux(
    hi, lo, valid, table, main_slots: int, stash, stash_slots: int,
    bucket: int,
):
    """As lookup_ecs, but also returns the matched rows' aux column (the
    per-k-mer EC run length written by the index builder)."""
    shape = hi.shape
    hi_f = hi.reshape(-1)
    lo_f = lo.reshape(-1)
    valid_f = valid.reshape(-1)
    N = hi_f.shape[0]

    ec, aux, found, full = _bucket_lookup(hi_f, lo_f, table, main_slots,
                                          bucket, hash_kmer)
    hit = valid_f & found
    ec = jnp.where(hit, ec, MISS)
    aux = jnp.where(hit, aux, 0)

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

    ec2, aux2, found2, _ = _bucket_lookup(c_hi[:N2], c_lo[:N2], stash,
                                          stash_slots, bucket,
                                          hash_kmer_stash)
    ec_ext = jnp.concatenate([ec, jnp.zeros(1, jnp.int32)])
    aux_ext = jnp.concatenate([aux, jnp.zeros(1, jnp.int32)])
    src = jnp.where(found2, c_src[:N2], N)
    ec_ext = ec_ext.at[src].set(jnp.where(found2, ec2, 0), mode="drop")
    aux_ext = aux_ext.at[src].set(jnp.where(found2, aux2, 0), mode="drop")
    return ec_ext[:N].reshape(shape), aux_ext[:N].reshape(shape)


def lookup_ecs_strided(
    hi, lo, valid, table, main_slots: int, stash, stash_slots: int,
    bucket: int, stride: int,
):
    """Strided lookup with exact gap coverage via EC run lengths.

    Probes every ``stride``-th window (plus the last), then uses the aux
    run-length ``d`` of each hit — "d adjacent windows provably share this
    EC in every indexed context" — to fill the windows between samples.
    Gaps not covered from either side (sample missed, or d too small:
    error windows, EC-run boundaries) are cumsum-compacted and probed
    densely, so the result equals the dense lookup except for reads whose
    error-windows collide with indexed k-mers (~1e-7 per window; see
    MapConfig.probe_stride).

    Returns ec int32[B, P].
    """
    if stride <= 1:
        return lookup_ecs(hi, lo, valid, table, main_slots, stash,
                          stash_slots, bucket)
    B, P = hi.shape
    s = stride
    Ps = -(-P // s)  # samples at 0, s, ..., (Ps-1)*s

    def sample(x):
        return jnp.concatenate([x[:, ::s], x[:, P - 1 :]], axis=1)

    hi_s, lo_s, valid_s = sample(hi), sample(lo), sample(valid)
    ec_s, d_s = lookup_ecs_aux(hi_s, lo_s, valid_s, table, main_slots,
                               stash, stash_slots, bucket)

    pos = jnp.arange(P, dtype=jnp.int32)
    gap = pos // s
    pl = gap * s
    pr = jnp.minimum(pl + s, P - 1)

    def spread_left(x):
        # value of the left sample for every position (repeat, not gather)
        return jnp.repeat(x[:, :Ps], s, axis=1)[:, :P]

    def spread_right(x):
        # right sample of each gap: samples 1..Ps-1 then the extra (P-1)
        rs = jnp.concatenate([x[:, 1:Ps], x[:, Ps:]], axis=1)
        full = jnp.repeat(rs, s, axis=1)[:, :P]
        return full

    ec_l, d_l = spread_left(ec_s), spread_left(d_s)
    ec_r, d_r = spread_right(ec_s), spread_right(d_s)
    dist_l = pos - pl
    dist_r = pr - pos

    cov_l = (ec_l >= 0) & (d_l >= dist_l)
    cov_r = (ec_r >= 0) & (d_r >= dist_r)
    is_sample = (pos % s == 0) | (pos == P - 1)

    # sampled positions keep their probed result exactly
    ec_sampled = jnp.where(dist_l == 0, ec_l, MISS)
    ec_sampled = jnp.where(pos == P - 1, ec_s[:, -1:], ec_sampled)
    fill = jnp.where(cov_l, ec_l, jnp.where(cov_r, ec_r, MISS))
    need = ~is_sample & ~cov_l & ~cov_r & valid

    # dense-probe the uncovered lanes, compacted
    need_f = need.reshape(-1)
    N = B * P
    N2 = max(N // 2, 64)
    rank = jnp.cumsum(need_f.astype(jnp.int32)) - 1
    ok = need_f & (rank < N2)
    cpos = jnp.where(ok, rank, N2)
    hi_f, lo_f = hi.reshape(-1), lo.reshape(-1)
    c_hi = jnp.zeros(N2 + 1, jnp.int32).at[cpos].set(hi_f, mode="drop")
    c_lo = jnp.zeros(N2 + 1, jnp.int32).at[cpos].set(lo_f, mode="drop")
    c_ok = jnp.zeros(N2 + 1, bool).at[cpos].set(ok, mode="drop")
    idx = jnp.arange(N, dtype=jnp.int32)
    c_src = jnp.full(N2 + 1, N, jnp.int32).at[cpos].set(
        jnp.where(ok, idx, N), mode="drop")
    ec_d = lookup_ecs(c_hi[:N2], c_lo[:N2], c_ok[:N2], table, main_slots,
                      stash, stash_slots, bucket)

    ec0 = jnp.where(is_sample, ec_sampled, fill)
    ec_ext = jnp.concatenate([ec0.reshape(-1), jnp.zeros(1, jnp.int32)])
    ec_ext = ec_ext.at[c_src[:N2]].set(ec_d, mode="drop")
    ec = ec_ext[:N].reshape(B, P)
    return jnp.where(valid, ec, MISS)

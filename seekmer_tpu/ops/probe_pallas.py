"""Pallas TPU kernel: fused bucket match/select for the k-mer lookup.

This is the Pallas form of the reference mapper's hash-probe inner loop
(seekmer mapper.py Cython kernel, SURVEY.md call stack 3.3): one kernel
performs, per lane, the whole-bucket key compare, matched-slot EC/aux
selection, and the found/full flag computation of ops/probe.py's
`_bucket_lookup` — the equivalence-class lookup step that BASELINE's north
star names as a Pallas kernel.

Division of labor, driven by the measured cost model (docs/PERFORMANCE.md):
random HBM access is optimal through XLA's gather engine (~10 ns/lane,
independent of row width; Pallas has no faster primitive — per-lane DMA
issue costs orders of magnitude more). So the bucket-row gather itself
stays an XLA gather, and this kernel fuses everything around it. The XLA
backend ("xla", default) instead lets XLA fuse the compare directly into
the gather consumer, avoiding the (N, 4*bucket) HBM materialization that
feeding a kernel requires — measured faster; this kernel is kept as the
explicit-kernel form (MapConfig.probe_backend="pallas"), an independent
semantic check, and the benchmark counterpart (SURVEY.md 7.4: "keep
whichever wins per shape").

Layout note: per-lane scalar results are accumulated into a TRANSPOSED
(128, NC) output — a (128, 1) column reduction writes a column slice of the
block — because a (N, 1) output array would be tile-padded 128x in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hash import hash_kmer, hash_kmer_stash
from .probe import EMPTY, MISS, _lookup_flat

_LANES = 128  # sublane group: lanes per output column
# m (columns per grid step) must be 128 when compiled: Mosaic requires the
# last block dim to be a multiple of 128. Smaller m is allowed under
# interpret=True (tests).


def _match_kernel(hi_ref, lo_ref, rows_ref, ec_ref, aux_ref, flags_ref, *,
                  m: int, bucket: int):
    """Match m*128 lanes against their gathered bucket rows.

    hi/lo blocks: (128, m) transposed lane layout; rows block:
    (m*128, 4*bucket) slab rows ``[hi x G | lo x G | ecaux x G | meta x G]``
    (probe.device_table_layout) with row j = lane (j % 128) of column
    (j // 128); outputs (128, m): ec, aux, flags (bit0 = found, bit1 =
    bucket full). (Mosaic requires last block dims to be multiples of 128,
    so m = 128.)
    """
    from .probe import AUX_BITS, AUX_MASK

    G = bucket
    W = 4 * G
    col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, W), 1)
    is_key_hi = col < G
    is_key_lo = (col >= G) & (col < 2 * G)
    is_meta = col == 3 * G
    lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, m), 1)
    hi_all = hi_ref[:]
    lo_all = lo_ref[:]

    # Mosaic supports neither narrow dynamic lane-dim slices nor narrow
    # lane-dim stores, so column c of the (128, m) key/result layout is
    # extracted with a masked reduction and written back with a masked
    # select into a full-width accumulator — all full-width VPU ops.
    def body(c, carry):
        acc_ec, acc_aux, acc_fl = carry
        r0 = pl.multiple_of(c * _LANES, _LANES)
        sub = rows_ref[pl.ds(r0, _LANES), :]
        sel = lane == c
        hi_col = jnp.sum(jnp.where(sel, hi_all, 0), axis=1, keepdims=True)
        lo_col = jnp.sum(jnp.where(sel, lo_all, 0), axis=1, keepdims=True)
        eq_hi = jnp.where(is_key_hi, (sub == hi_col).astype(jnp.int32), 0)
        eq_lo = jnp.where(is_key_lo, (sub == lo_col).astype(jnp.int32), 0)
        # slot j matches iff hi-slab col j and lo-slab col G+j both equal
        # the key; align the lo slab onto the hi slab with a left circular
        # roll by G (wrapped cols land outside the masked slabs)
        pair = eq_hi * pltpu.roll(eq_lo, shift=W - G, axis=1)
        ecauxs = pltpu.roll(sub, shift=W - 2 * G, axis=1)  # ecaux slab -> 0
        ecaux = jnp.max(jnp.where(pair > 0, ecauxs, -1), axis=1,
                        keepdims=True)
        found = (ecaux >= 0).astype(jnp.int32)
        ec = ecaux >> AUX_BITS  # arithmetic shift keeps -1 = MISS
        aux = jnp.where(found > 0, ecaux & AUX_MASK, 0)
        full = jnp.max(jnp.where(is_meta, sub, 0), axis=1, keepdims=True)
        return (jnp.where(sel, ec, acc_ec),
                jnp.where(sel, aux, acc_aux),
                jnp.where(sel, found | (full << 1), acc_fl))

    zero = jnp.zeros((_LANES, m), jnp.int32)
    acc_ec, acc_aux, acc_fl = jax.lax.fori_loop(
        0, m, body, (zero, zero, zero))
    ec_ref[:] = acc_ec
    aux_ref[:] = acc_aux
    flags_ref[:] = acc_fl


@functools.partial(jax.jit,
                   static_argnames=("slots", "bucket", "salt", "m",
                                    "interpret"))
def _bucket_match_pallas(hi_f, lo_f, table, slots: int, bucket: int,
                         salt: bool, m: int = 128, interpret: bool = False):
    """Pallas-kernel counterpart of probe._bucket_lookup (flat int32 lanes).

    salt=False hashes with hash_kmer (main table), True with
    hash_kmer_stash. Returns (ec, aux, found, full) over flat lanes.
    """
    N = hi_f.shape[0]
    nb = slots // bucket
    hash_fn = hash_kmer_stash if salt else hash_kmer
    hb = (hash_fn(hi_f.astype(jnp.uint32), lo_f.astype(jnp.uint32))
          & jnp.uint32(nb - 1)).astype(jnp.int32)
    rows = table[hb]  # (N, 4*bucket) — the one random-access HBM gather

    group = m * _LANES
    Np = -(-N // group) * group
    NC = Np // _LANES
    pad = Np - N
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)), constant_values=EMPTY)
        hi_f = jnp.pad(hi_f, (0, pad))
        lo_f = jnp.pad(lo_f, (0, pad))
    # lane i <-> (sublane i % 128, column i // 128)
    hi_t = hi_f.reshape(NC, _LANES).T
    lo_t = lo_f.reshape(NC, _LANES).T

    grid = (NC // m,)
    lane_spec = pl.BlockSpec((_LANES, m), lambda g: (0, g),
                             memory_space=pltpu.VMEM)
    ec_t, aux_t, flags_t = pl.pallas_call(
        functools.partial(_match_kernel, m=m, bucket=bucket),
        grid=grid,
        in_specs=[
            lane_spec,
            lane_spec,
            pl.BlockSpec((group, 4 * bucket), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(lane_spec, lane_spec, lane_spec),
        out_shape=(
            jax.ShapeDtypeStruct((_LANES, NC), jnp.int32),
            jax.ShapeDtypeStruct((_LANES, NC), jnp.int32),
            jax.ShapeDtypeStruct((_LANES, NC), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(hi_t, lo_t, rows)

    def untranspose(x):
        return x.T.reshape(-1)[:N]

    ec = untranspose(ec_t)
    aux = untranspose(aux_t)
    flags = untranspose(flags_t)
    return ec, aux, (flags & 1) > 0, (flags & 2) > 0


def make_bucket_lookup(m: int = 128, interpret: bool = False):
    """A probe.py-compatible ``bucket_lookup`` driving the Pallas kernel."""

    def bucket_lookup(hi, lo, table, slots, bucket, hash_fn):
        salt = hash_fn is hash_kmer_stash
        return _bucket_match_pallas(hi, lo, table, slots, bucket, salt,
                                    m=m, interpret=interpret)

    return bucket_lookup


def lookup_ecs_aux_pallas(hi, lo, valid, table, main_slots: int, stash,
                          stash_slots: int, bucket: int, m: int = 128,
                          interpret: bool = False):
    """Drop-in for probe.lookup_ecs_aux with the Pallas match kernel."""
    shape = hi.shape
    ec, aux = _lookup_flat(
        hi.reshape(-1), lo.reshape(-1), valid.reshape(-1), table, main_slots,
        stash, stash_slots, bucket,
        bucket_lookup=make_bucket_lookup(m=m, interpret=interpret))
    return ec.reshape(shape), aux.reshape(shape)


def lookup_ecs_pallas(hi, lo, valid, table, main_slots: int, stash,
                      stash_slots: int, bucket: int, m: int = 128,
                      interpret: bool = False):
    """Drop-in for probe.lookup_ecs with the Pallas match kernel."""
    ec, _ = lookup_ecs_aux_pallas(hi, lo, valid, table, main_slots, stash,
                                  stash_slots, bucket, m=m,
                                  interpret=interpret)
    return ec

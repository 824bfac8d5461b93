"""Device-side canonical k-mer extraction over read batches (jit/vmap-able).

Replaces the rolling-hash inner loop of the reference's Cython mapper
(SURVEY.md 2.1 C4, call stack 3.3): instead of rolling sequentially with a
skipping heuristic, every window of every read is packed in parallel on the
VPU — k statically-unrolled shifted adds over a (batch, positions) plane
(SURVEY.md 7.4).

Keys use the dual-lane int32 layout of seekmer_tpu.encoding: hi = first
k//2 bases, lo = rest, big-endian 2 bits per base; canonical = lexicographic
min of forward and reverse-complement lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..encoding import n_hi_lo


def unpack_codes_2bit(packed: jnp.ndarray, bad: jnp.ndarray,
                      L: int) -> jnp.ndarray:
    """Device-side inverse of encoding.pack_codes_2bit.

    Args:
      packed: uint8[B, (L+3)//4] — base j at bits 2*(j%4) of byte j//4.
      bad: uint8[B, (L+7)//8] — bit j%8 of byte j//8 marks invalid base j.
      L: unpacked padded read length (static).

    Returns int32[B, L] codes (0..3 valid, 4 invalid) — bit-exact with the
    uint8 rows the host would otherwise ship, at 0.375 bytes/base of H2D.
    Pure VPU shifts/selects; XLA fuses this into pack_canonical's window
    pack, so the unpack adds no materialized (B, L) HBM round-trip.
    """
    B = packed.shape[0]
    p = packed.astype(jnp.int32)
    shifts = (jnp.arange(4, dtype=jnp.int32) * 2)[None, None, :]
    c = (p[:, :, None] >> shifts) & 3  # (B, L4, 4)
    c = c.reshape(B, -1)[:, :L]
    b = bad.astype(jnp.int32)
    bshifts = jnp.arange(8, dtype=jnp.int32)[None, None, :]
    m = (b[:, :, None] >> bshifts) & 1  # (B, L8, 8)
    m = m.reshape(B, -1)[:, :L]
    return jnp.where(m == 1, jnp.int32(4), c)


def pack_canonical(codes: jnp.ndarray, lengths: jnp.ndarray, k: int):
    """Canonical k-mers of every window of a padded read batch.

    Args:
      codes: int32/uint8[B, L] base codes (0..3 valid, >=4 invalid/pad).
      lengths: int32[B] true read lengths (<= L).
      k: k-mer length (static).

    Returns:
      (hi, lo, valid): int32[B, P], int32[B, P], bool[B, P] with
      P = L - k + 1; valid windows contain no invalid base and lie within
      the read.
    """
    B, L = codes.shape
    if L < k:
        raise ValueError(f"padded length {L} < k={k}")
    P = L - k + 1
    n_hi, n_lo = n_hi_lo(k)
    c = codes.astype(jnp.int32)
    bad = c > 3
    safe = jnp.where(bad, 0, c)

    hi_f = jnp.zeros((B, P), jnp.int32)
    lo_f = jnp.zeros((B, P), jnp.int32)
    hi_r = jnp.zeros((B, P), jnp.int32)
    lo_r = jnp.zeros((B, P), jnp.int32)
    any_bad = jnp.zeros((B, P), bool)
    for i in range(k):  # static unroll: k shifted adds on the VPU
        s = safe[:, i : i + P]
        any_bad = any_bad | bad[:, i : i + P]
        # forward: base i -> hi slot i (i < n_hi) else lo slot i - n_hi
        if i < n_hi:
            hi_f = hi_f + (s << (2 * (n_hi - 1 - i)))
        else:
            lo_f = lo_f + (s << (2 * (n_lo - 1 - (i - n_hi))))
        # revcomp window base j reads original position i = k-1-j
        j = k - 1 - i
        rc = 3 - s
        if j < n_hi:
            hi_r = hi_r + (rc << (2 * (n_hi - 1 - j)))
        else:
            lo_r = lo_r + (rc << (2 * (n_lo - 1 - (j - n_hi))))

    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    in_read = pos + k <= lengths.astype(jnp.int32)[:, None]
    valid = in_read & ~any_bad

    use_f = (hi_f < hi_r) | ((hi_f == hi_r) & (lo_f <= lo_r))
    hi = jnp.where(use_f, hi_f, hi_r)
    lo = jnp.where(use_f, lo_f, lo_r)
    return hi, lo, valid

"""Pallas TPU kernel: fused canonical k-mer window packing.

The VPU analog of ops/kmer_pack.py (the reference's Cython rolling-hash
inner loop, SURVEY.md 3.3): one kernel pass computes, for a block of reads,
the forward and reverse-complement packed lanes, canonical selection and
validity — ~4k fused elementwise ops per window without materializing any
intermediate in HBM. Grid over read blocks; all refs in VMEM.

Selected via MapConfig.pack_backend ("xla" keeps the jnp version — XLA
fuses it well already; this kernel exists to pin the fusion and for the
kernel-vs-XLA benchmark in benchmarks/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..encoding import n_hi_lo


def _pack_kernel(codes_ref, lengths_ref, hi_ref, lo_ref, valid_ref, *,
                 k: int, P: int):
    n_hi, n_lo = n_hi_lo(k)
    c = codes_ref[:].astype(jnp.int32)
    B = c.shape[0]
    bad = c > 3
    safe = jnp.where(bad, 0, c)

    hi_f = jnp.zeros((B, P), jnp.int32)
    lo_f = jnp.zeros((B, P), jnp.int32)
    hi_r = jnp.zeros((B, P), jnp.int32)
    lo_r = jnp.zeros((B, P), jnp.int32)
    any_bad = jnp.zeros((B, P), jnp.bool_)
    for i in range(k):
        s = safe[:, i : i + P]
        any_bad = any_bad | bad[:, i : i + P]
        if i < n_hi:
            hi_f = hi_f + (s << (2 * (n_hi - 1 - i)))
        else:
            lo_f = lo_f + (s << (2 * (n_lo - 1 - (i - n_hi))))
        j = k - 1 - i
        rc = 3 - s
        if j < n_hi:
            hi_r = hi_r + (rc << (2 * (n_hi - 1 - j)))
        else:
            lo_r = lo_r + (rc << (2 * (n_lo - 1 - (j - n_hi))))

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, P), 1)
    in_read = pos + k <= lengths_ref[:]
    valid = in_read & ~any_bad

    use_f = (hi_f < hi_r) | ((hi_f == hi_r) & (lo_f <= lo_r))
    hi_ref[:] = jnp.where(use_f, hi_f, hi_r)
    lo_ref[:] = jnp.where(use_f, lo_f, lo_r)
    valid_ref[:] = valid.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("k", "block", "interpret"))
def pack_canonical_pallas(codes, lengths, k: int, block: int = 256,
                          interpret: bool = False):
    """Drop-in for ops.kmer_pack.pack_canonical via a Pallas kernel."""
    B, L = codes.shape
    if L < k:
        raise ValueError(f"padded length {L} < k={k}")
    P = L - k + 1
    Bp = -(-B // block) * block
    codes_p = jnp.pad(codes.astype(jnp.int32), ((0, Bp - B), (0, 0)),
                      constant_values=4)
    lengths_p = jnp.pad(lengths.astype(jnp.int32), (0, Bp - B))[:, None]

    grid = (Bp // block,)
    hi, lo, valid = pl.pallas_call(
        functools.partial(_pack_kernel, k=k, P=P),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, P), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, P), jnp.int32),
            jax.ShapeDtypeStruct((Bp, P), jnp.int32),
            jax.ShapeDtypeStruct((Bp, P), jnp.int8),
        ),
        interpret=interpret,
    )(codes_p, lengths_p)
    return hi[:B], lo[:B], valid[:B].astype(jnp.bool_)
"""Pallas TPU kernel: per-read EC signature extraction (sorted distinct
equivalence-class ids) — the equivalence-class-intersection step of the
mapper (reference: seekmer mapper.py's per-read target-set intersection,
SURVEY.md call stack 3.3; named a Pallas kernel by BASELINE's north star).

map/signature.read_signatures expresses this as two XLA row-sorts; this
kernel runs the same computation as one fused pass per read block: a
bitonic compare-exchange network over the (power-of-two padded) window
axis built from pltpu.roll (partner i^d is a pair of circular rolls +- d
masked by lane bit d), duplicate suppression against the left neighbor,
and a second bitonic pass that compacts the surviving distinct ids to the
front. Selected via MapConfig.sig_backend="pallas"; "xla" (default) keeps
the jnp form — benchmark both per shape (SURVEY.md 7.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIG_PAD = 0x7FFFFFFF  # sorts after every real EC id (int32 max)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _bitonic_sort_rows(x, W: int):
    """Ascending bitonic sort along the lane axis (W = power-of-two lane
    count). 28 compare-exchange steps for W=128, each a pair of circular
    rolls + select — no lax.sort (unsupported in Mosaic)."""
    B = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    log2w = W.bit_length() - 1
    for p in range(1, log2w + 1):
        up = (jax.lax.shift_right_logical(lane, p) & 1) == 0
        for q in range(p - 1, -1, -1):
            d = 1 << q
            lower = (lane & d) == 0  # lane holds the smaller index of pair
            partner = jnp.where(lower,
                                pltpu.roll(x, shift=W - d, axis=1),
                                pltpu.roll(x, shift=d, axis=1))
            take_min = up == lower
            x = jnp.where(take_min, jnp.minimum(x, partner),
                          jnp.maximum(x, partner))
    return x


def _sig_kernel(ecs_ref, valid_ref, sig_ref, mapped_ref, *, W: int, C: int):
    # valid arrives as int32: Mosaic on this target rejects i8 vector
    # compares ("Target does not support this comparison")
    x = jnp.where((valid_ref[:] > 0) & (ecs_ref[:] >= 0), ecs_ref[:],
                  SIG_PAD)
    s = _bitonic_sort_rows(x, W)
    prev = pltpu.roll(s, shift=1, axis=1)  # lane 0 wraps: mask it below
    B = s.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    is_new = ((s != prev) | (lane == 0)) & (s != SIG_PAD)
    n_distinct = jnp.sum(is_new.astype(jnp.int32), axis=1, keepdims=True)
    s = _bitonic_sort_rows(jnp.where(is_new, s, SIG_PAD), W)
    sig_ref[:] = s[:, :C]
    mapped_ref[:] = ((n_distinct > 0) & (n_distinct <= C)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_ecs", "block", "interpret"))
def read_signatures_pallas(ecs, valid, max_ecs: int, block: int = 512,
                           interpret: bool = False):
    """Drop-in for map.signature.read_signatures via a Pallas kernel.

    Returns (sig int32[B, C] sorted distinct EC ids padded with SIG_PAD,
    mapped bool[B]).
    """
    B, P = ecs.shape
    C = max_ecs
    W = max(_next_pow2(max(P, C)), 128)
    Bp = -(-B // block) * block
    ecs_p = jnp.pad(ecs, ((0, Bp - B), (0, W - P)), constant_values=-1)
    valid_p = jnp.pad(valid.astype(jnp.int32), ((0, Bp - B), (0, W - P)))

    grid = (Bp // block,)
    sig, mapped = pl.pallas_call(
        functools.partial(_sig_kernel, W=W, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, C), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(ecs_p, valid_p)
    return sig[:B], mapped[:B, 0].astype(jnp.bool_)

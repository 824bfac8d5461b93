"""Vectorized open-addressing probe of the k-mer table on device.

Replaces the reference mapper's per-k-mer hash-probe walk (SURVEY.md call
stack 3.3) with a data-parallel probe: every lane (one lane per k-mer
window) gathers its 16-byte table row per round; an early-exit
``lax.while_loop`` stops as soon as every lane has either matched or hit an
empty slot. Keys displaced beyond the main probe bound at build time live in
the stash table (see index/build.py), so both loops have small static caps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hash import hash_kmer, hash_kmer_stash

EMPTY = jnp.int32(-1)
MISS = jnp.int32(-1)


def _probe(hi, lo, active, table, slots: int, probe_cap: int, hash_fn):
    """One table's probe loop.

    Returns (ec, resolved): ec int32[N] (MISS where absent/unresolved),
    resolved bool[N] — lanes that found a match OR proved absence (empty
    slot). Lanes with active=False are returned resolved with MISS.
    """
    mask = jnp.uint32(slots - 1)
    home = (hash_fn(hi.astype(jnp.uint32), lo.astype(jnp.uint32)) & mask).astype(
        jnp.int32
    )
    ec0 = jnp.full(hi.shape, MISS)
    done0 = ~active

    def cond(state):
        r, done, _ = state
        return (r < probe_cap) & ~jnp.all(done)

    def body(state):
        r, done, ec = state
        rows = table[home + r]  # [N, 4] gather of 16B rows
        hit = (rows[..., 0] == hi) & (rows[..., 1] == lo) & ~done
        ec = jnp.where(hit, rows[..., 2], ec)
        empty = rows[..., 0] == EMPTY
        return r + 1, done | hit | empty, ec

    _, done, ec = jax.lax.while_loop(cond, body, (jnp.int32(0), done0, ec0))
    return ec, done


def lookup_ecs(
    hi,
    lo,
    valid,
    table,
    main_slots: int,
    main_probe: int,
    stash,
    stash_slots: int,
    stash_probe: int,
):
    """k-mer (hi, lo) lanes -> EC ids (MISS = -1 for absent/invalid).

    Main-table lanes left unresolved after ``main_probe`` rounds (long
    cluster, key possibly stashed) fall through to the stash probe.
    """
    ec_main, resolved = _probe(hi, lo, valid, table, main_slots, main_probe, hash_kmer)
    need_stash = valid & ~resolved
    ec_stash, _ = _probe(
        hi, lo, need_stash, stash, stash_slots, stash_probe, hash_kmer_stash
    )
    return jnp.where(resolved, ec_main, ec_stash)

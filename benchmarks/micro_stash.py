"""Isolate the stash-coverage overhead inside _lookup_flat at config-2 scale.

The profile (profile_map.py --isoform) measured: bucket lookup 62 ms but
full probe 76 ms — the stash machinery (pad + block_compact + one compacted
round + residual while_loop) costs ~14 ms/5M lanes, far above the ~1 ms it
was believed to cost. Variants:

  A  full current _lookup_flat (baseline)
  B  main-bucket lookup only (no stash coverage — the floor)
  C  + one unconditional compacted stash round, NO residual while_loop
  D  C but concat-free (jnp.take mode=clip + scatter mode=drop, no
     N+1-extension copies)
  E  D + residual while_loop (exact coverage, candidate replacement)

Run single-process on the real chip after configs.py 2 has cached its index:
  python benchmarks/micro_stash.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.configs import _world
    from seekmer_tpu.map.driver import DeviceIndex
    from seekmer_tpu.ops.hash import hash_kmer, hash_kmer_stash
    from seekmer_tpu.ops.kmer_pack import pack_canonical
    from seekmer_tpu.ops.probe import (
        _BLK, _bucket_lookup, _pad_to_block, block_compact,
    )
    from seekmer_tpu.utils.simulate import simulate_packed_batches

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng, index, seqs, _ = _world(60000, isoform=True)
    di = DeviceIndex.from_host(index)
    B, L, NBATCH = 65536, 100, 8
    codes, _ = simulate_packed_batches(rng, seqs, NBATCH, B, read_len=L)
    codes_d = [jnp.asarray(c) for c in codes]
    lengths = jnp.full(B, L, jnp.int32)
    k = index.k
    MISS = jnp.int32(-1)

    def lanes(c):
        hi, lo, valid = pack_canonical(c, lengths, k)
        return hi.reshape(-1), lo.reshape(-1), valid.reshape(-1)

    def main_lookup(hi_f, lo_f, valid_f, tb):
        ec, aux, found, full = _bucket_lookup(
            hi_f, lo_f, tb, di.main_slots, di.bucket, hash_kmer)
        hit = valid_f & found
        return (jnp.where(hit, ec, MISS), jnp.where(hit, aux, 0),
                valid_f & ~found & full)

    def variant_A(tb, st, c):
        from seekmer_tpu.ops.probe import _lookup_flat

        hi_f, lo_f, valid_f = lanes(c)
        ec, aux = _lookup_flat(hi_f, lo_f, valid_f, tb, di.main_slots, st,
                               di.stash_slots, di.bucket)
        return ec

    def variant_B(tb, st, c):
        hi_f, lo_f, valid_f = lanes(c)
        ec, aux, need = main_lookup(hi_f, lo_f, valid_f, tb)
        return ec

    def variant_B2(tb, st, c):
        # + the one per-block any pass (consumed so it can't be DCE'd)
        hi_f, lo_f, valid_f = lanes(c)
        ec, aux, need = main_lookup(hi_f, lo_f, valid_f, tb)
        blk = need.reshape(need.shape[0] // _BLK, _BLK).any(axis=1)
        return ec + blk.sum()

    def make_B2g(blk_size, as_int):
        def f(tb, st, c):
            # granularity/dtype variants of the block-any pass: a (N,) bool
            # reshaped to minor dim 32 may force a relayout (TPU 1-D tiling
            # is (8,128)); minor dim 1024 is layout-compatible
            hi_f, lo_f, valid_f = lanes(c)
            ec, aux, need = main_lookup(hi_f, lo_f, valid_f, tb)
            n = need.shape[0]
            if as_int:
                x = need.astype(jnp.int32)
                blk = x.reshape(n // blk_size, blk_size).max(axis=1)
                return ec + blk.sum()
            blk = need.reshape(n // blk_size, blk_size).any(axis=1)
            return ec + blk.sum()
        return f

    def make_C2(with_while):
        def f(tb, st, c):
            # + the unconditional compacted stash round (current lean form)
            from seekmer_tpu.ops.probe import block_compact as bc

            hi_f, lo_f, valid_f = lanes(c)
            N = hi_f.shape[0]
            ec, aux, need0 = main_lookup(hi_f, lo_f, valid_f, tb)
            NB = N // _BLK
            max_blocks = max(NB // 64, 16)
            blk_need0 = need0.reshape(NB, _BLK).any(axis=1)

            def round_(state):
                ec, aux, blk_need = state
                lane_idx, residual_blocks = bc(blk_need, max_blocks)
                li = jnp.minimum(lane_idx, N - 1)
                c_hi, c_lo = hi_f[li], lo_f[li]
                c_need = need0[li] & (lane_idx < N)
                ec2, aux2, found2, _ = _bucket_lookup(
                    c_hi, c_lo, st, di.stash_slots, di.bucket,
                    hash_kmer_stash)
                write = c_need & found2
                dst = jnp.where(write, lane_idx, N)
                ec = ec.at[dst].set(jnp.where(write, ec2, 0), mode="drop")
                aux = aux.at[dst].set(jnp.where(write, aux2, 0), mode="drop")
                return ec, aux, residual_blocks

            ec, aux, resid = round_((ec, aux, blk_need0))
            if with_while:
                ec, aux, _ = jax.lax.while_loop(
                    lambda s: s[2].any(), round_, (ec, aux, resid))
            return ec
        return f

    def readback(x):
        return np.asarray(x.reshape(-1)[:8]).sum()

    def bench(name, fn):
        f = jax.jit(fn)
        readback(f(di.table, di.stash, codes_d[0]))
        n = 3

        def run(m, o):
            t0 = time.perf_counter()
            out = None
            for i in range(m):
                out = f(di.table, di.stash, codes_d[1 + (o + i) % (NBATCH - 1)])
            readback(out)
            return time.perf_counter() - t0

        run(1, 0)
        t_n, t_2n = run(n, 0), run(2 * n, n)
        dt = (t_2n - t_n) / n
        log(f"{name:44s} {dt*1e3:8.2f} ms/batch")
        return dt

    # History (2026-08-19, this chip): the ORIGINAL per-lane block_compact
    # measured A=77.0 / B=62.0 / concat-free and while-free variants all
    # ~76-77 — proving the ~14 ms gap was the per-lane passes inside
    # block_compact itself (block-any + block-sum + repeat-mask residual),
    # not the concatenates or the while_loop. The rewrite made blk_need a
    # single N-pass and residual state block-granular.
    bench("B main bucket only (floor)", variant_B)
    bench("B2 blk=32 bool any", variant_B2)
    bench("B2g blk=1024 bool any", make_B2g(1024, False))
    bench("B2g blk=1024 int32 max", make_B2g(1024, True))
    bench("B2g blk=128 bool any", make_B2g(128, False))
    bench("B floor again (drift check)", variant_B)


if __name__ == "__main__":
    main()

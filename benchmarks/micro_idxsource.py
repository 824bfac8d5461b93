"""Does the SOURCE of gather indices change the bucket-gather rate?

micro_quotient.py (pre-uploaded random indices) measured ~34.5 ms per 5M
full-row 512B gathers on a 1GB table; the production-shaped floor (indices
computed on device from pack_canonical + mix32) measured ~54-63 ms in other
sessions. Same lanes, same table. This micro A/Bs the index source within
one process to separate real dependency-chain cost from session drift.

  V1 pre-uploaded idx, compare+select consume        (micro_quotient form)
  V2 idx = mix32 hash of pre-uploaded hi/lo lanes    (+ on-device hashing)
  V3 idx = hash of pack_canonical(codes) windows     (the production form)

Run single-process on the real chip (needs the cached config-2 index):
  python benchmarks/micro_idxsource.py
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
    from seekmer_tpu.ops.hash import hash_kmer
    from seekmer_tpu.ops.kmer_pack import pack_canonical
    from seekmer_tpu.utils.simulate import simulate_packed_batches

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng, index, seqs, _ = _world(60000, isoform=True)
    di = DeviceIndex.from_host(index)
    nb = di.main_slots // di.bucket
    G = di.bucket
    B, L, NBATCH = 65536, 100, 8
    N = B * 76  # windows per batch at L=100, k=25

    codes, _ = simulate_packed_batches(rng, seqs, NBATCH, B, read_len=L)
    codes_d = [jnp.asarray(c) for c in codes]
    lengths = jnp.full(B, L, jnp.int32)
    k = index.k

    idx_up = [jnp.asarray(rng.integers(0, nb, size=N, dtype=np.int32))
              for _ in range(NBATCH)]
    hi_up = [jnp.asarray(rng.integers(0, 1 << 26, size=N, dtype=np.int64)
                         .astype(np.int32)) for _ in range(NBATCH)]
    lo_up = [jnp.asarray(rng.integers(0, 1 << 24, size=N, dtype=np.int64)
                         .astype(np.int32)) for _ in range(NBATCH)]
    jax.block_until_ready(idx_up + hi_up + lo_up)

    def consume(tb, hb, hi, lo):
        rows = tb[hb]
        match = ((rows[:, :G] == hi[:, None])
                 & (rows[:, G:2 * G] == lo[:, None]))
        ecaux = jnp.max(jnp.where(match, rows[:, 2 * G:3 * G], -1), axis=1)
        return jnp.where(ecaux >= 0, ecaux >> 7, -1)

    def v3(tb, c):
        hi, lo, valid = pack_canonical(c, lengths, k)
        hi, lo = hi.reshape(-1), lo.reshape(-1)
        hb = (hash_kmer(hi.astype(jnp.uint32), lo.astype(jnp.uint32))
              & jnp.uint32(nb - 1)).astype(jnp.int32)
        return consume(tb, hb, hi, lo)

    def readback(x):
        return np.asarray(x.reshape(-1)[:8]).sum()

    def bench(name, fn, feed):
        f = jax.jit(fn)
        readback(f(di.table, feed[0]))
        n = 3

        def run(m, o):
            t0 = time.perf_counter()
            out = None
            for i in range(m):
                out = f(di.table, feed[1 + (o + i) % (NBATCH - 1)])
            readback(out)
            return time.perf_counter() - t0

        run(1, 0)
        t_n, t_2n = run(n, 0), run(2 * n, n)
        dt = (t_2n - t_n) / n
        log(f"{name:52s} {dt*1e3:8.2f} ms/batch")
        return dt

    def v1_args(tb, ix, hi, lo):
        return consume(tb, ix, hi, lo)

    def v2_args(tb, ix_unused, hi, lo):
        hb = (hash_kmer(hi.astype(jnp.uint32), lo.astype(jnp.uint32))
              & jnp.uint32(nb - 1)).astype(jnp.int32)
        return consume(tb, hb, hi, lo)

    def bench_args(name, fn):
        f = jax.jit(fn)
        readback(f(di.table, idx_up[0], hi_up[0], lo_up[0]))
        n = 3

        def run(m, o):
            t0 = time.perf_counter()
            out = None
            for i in range(m):
                j = 1 + (o + i) % (NBATCH - 1)
                out = f(di.table, idx_up[j], hi_up[j], lo_up[j])
            readback(out)
            return time.perf_counter() - t0

        run(1, 0)
        t_n, t_2n = run(n, 0), run(2 * n, n)
        dt = (t_2n - t_n) / n
        log(f"{name:52s} {dt*1e3:8.2f} ms/batch")
        return dt

    bench_args("V1 pre-uploaded idx", v1_args)
    bench_args("V2 idx = mix32(pre-uploaded hi/lo)", v2_args)
    bench("V3 idx = mix32(pack_canonical(codes))", v3, codes_d)
    bench_args("V1 again (drift check)", v1_args)


if __name__ == "__main__":
    main()

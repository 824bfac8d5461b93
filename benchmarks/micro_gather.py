"""Micro-benchmark: TPU gather cost model for the probe loop design.

Compares R rounds of narrow row gathers (current probe: R x (N,4) rows)
against fewer rounds of wide bucket gathers ((N, G, 4) rows), to decide the
table layout. Run on the real chip: python benchmarks/micro_gather.py
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

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    S = 1 << 22  # 4M slots x 16B = 64MB table
    N = 5_000_000
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 20, size=(S, 4), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, S - 64, size=N, dtype=np.int32))

    def timed(name, fn, *args):
        out = jax.block_until_ready(jax.jit(fn)(*args))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = jax.block_until_ready(jax.jit(fn)(*args))
        dt = (time.perf_counter() - t0) / reps
        log(f"{name:40s} {dt*1e3:9.2f} ms  "
            f"{N/dt/1e6:8.1f} Mlane/s")
        return dt

    def rounds_narrow(R):
        def f(t, ix):
            acc = jnp.zeros(N, jnp.int32)
            for r in range(R):
                rows = t[ix + r]
                acc = acc + rows[:, 2]
            return acc
        return f

    def rounds_bucket(G, R):
        def f(t, ix):
            tb = t.reshape(S // G, G * 4)
            acc = jnp.zeros(N, jnp.int32)
            for r in range(R):
                rows = tb[(ix // G) + r]  # (N, G*4)
                acc = acc + rows[:, 2]
            return acc
        return f

    def one_narrow_col(_, ix):
        t1 = table[:, 0]
        return t1[ix]

    timed("1 round, (N,) from (S,) int32", one_narrow_col, table, idx)
    timed("1 round, (N,4) rows", rounds_narrow(1), table, idx)
    timed("4 rounds, (N,4) rows", rounds_narrow(4), table, idx)
    timed("7 rounds, (N,4) rows", rounds_narrow(7), table, idx)
    timed("1 round, G=4 bucket (N,16)", rounds_bucket(4, 1), table, idx)
    timed("2 rounds, G=4 bucket", rounds_bucket(4, 2), table, idx)
    timed("1 round, G=8 bucket (N,32)", rounds_bucket(8, 1), table, idx)
    timed("2 rounds, G=8 bucket", rounds_bucket(8, 2), table, idx)
    timed("1 round, G=16 bucket (N,64)", rounds_bucket(16, 1), table, idx)


def size_sweep():
    """Gather rate vs TABLE SIZE and index locality.

    Config 2 (GENCODE, ~1GB table) maps at ~34M probed lanes/s while the
    64MB-table micro number is ~75M lanes/s — this sweep isolates whether
    the wide bucket gather itself slows down on large tables (TLB/DRAM
    row locality) and whether clustered indices recover the rate.
    """
    import jax
    import jax.numpy as jnp

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    N = 5_000_000
    rng = np.random.default_rng(0)
    REPS = 5

    def timed(name, fn, table, idx_list):
        # MEASUREMENT PROTOCOL (hard-won): jit ONCE and reuse the wrapper,
        # feed a DISTINCT pre-uploaded index array per rep. Re-calling
        # jax.jit(fn) inside the timing loop on this remote-tunneled
        # platform returned ~0.25ms for a 2.5GB gather (10 TB/s —
        # impossible); a single wrapper + distinct inputs measures 46ms.
        f = jax.jit(fn)
        out = jax.block_until_ready(f(table, idx_list[0]))
        t0 = time.perf_counter()
        for k in range(1, REPS + 1):
            out = jax.block_until_ready(f(table, idx_list[k]))
        dt = (time.perf_counter() - t0) / REPS
        log(f"{name:52s} {dt*1e3:9.2f} ms  {N/dt/1e6:8.1f} Mlane/s")
        return dt

    def col2(t, i):
        # [:, 2] fuses into the gather: only 4B/lane is read
        return t[i][:, 2]

    def fullrow(t, i):
        # consuming every column forces the full 512B row read —
        # this is what the probe's 32-slot compare does
        return t[i].sum(axis=1)

    for mb in (64, 256, 1024):
        S = (mb << 20) // 16          # slots of 16B
        NB = S // 32                  # 32-slot buckets, 512B rows
        tb = jnp.asarray(
            rng.integers(0, 1 << 20, size=(NB, 128), dtype=np.int32))

        def uploads(nbuckets, transform=None):
            out = []
            for _ in range(REPS + 1):
                ix = rng.integers(0, nbuckets, size=N, dtype=np.int32)
                out.append(jnp.asarray(transform(ix) if transform else ix))
            jax.block_until_ready(out)
            return out

        shift = max(int(NB - 1).bit_length() - 8, 0)
        for tag, tr in (("random", None), ("sorted", np.sort),
                        ("binned256",
                         lambda ix: ix[np.argsort(ix >> shift,
                                                  kind="stable")])):
            idx_list = uploads(NB, tr)
            timed(f"{mb:5d}MB G=32 col-only, {tag}", col2, tb, idx_list)
            timed(f"{mb:5d}MB G=32 full-row, {tag}", fullrow, tb, idx_list)
        # narrower rows on the same table bytes
        tb16 = tb.reshape(NB * 2, 64)
        timed(f"{mb:5d}MB G=16 full-row, random", fullrow, tb16,
              uploads(NB * 2))
        tb8 = tb.reshape(NB * 4, 32)
        timed(f"{mb:5d}MB G=8  full-row, random", fullrow, tb8,
              uploads(NB * 4))
        del tb, tb16, tb8


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "size":
        size_sweep()
    else:
        main()

def probe_bench():
    """Isolated lookup_ecs_aux timing at realistic shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from seekmer_tpu.index.build import build_tables
    from seekmer_tpu.config import IndexConfig
    from seekmer_tpu.ops.probe import lookup_ecs_aux
    import sys, time

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    n = 1_250_000
    keys = np.unique(rng.integers(0, 1 << 50, size=n, dtype=np.uint64))
    vals = np.arange(keys.size, dtype=np.int32)
    from seekmer_tpu.ops.probe import device_table_layout
    for G in (8, 16, 32):
        t = build_tables(keys, vals, 25, IndexConfig(bucket_size=G))
        table = jnp.asarray(device_table_layout(t["table"], G))
        stash = jnp.asarray(device_table_layout(t["stash"], G))
        N = 5_000_000
        hi = jnp.asarray(rng.integers(0, 1 << 24, size=N, dtype=np.int64).astype(np.int32))
        lo = jnp.asarray(rng.integers(0, 1 << 26, size=N, dtype=np.int64).astype(np.int32))
        valid = jnp.ones(N, bool)
        f = jax.jit(lambda a, b, v: lookup_ecs_aux(
            a, b, v, table, t["main_slots"], stash, t["stash_slots"], G))
        out = jax.block_until_ready(f(hi, lo, valid))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jax.block_until_ready(f(hi, lo, valid))
        dt = (time.perf_counter() - t0) / 5
        log(f"lookup_ecs_aux G={G:3d}: {dt*1e3:8.2f} ms   {N/dt/1e6:6.1f} Mlane/s")

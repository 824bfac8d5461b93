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


if __name__ == "__main__":
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
    for G in (8, 16, 32):
        t = build_tables(keys, vals, 25, IndexConfig(bucket_size=G))
        table = jnp.asarray(t["table"]); stash = jnp.asarray(t["stash"])
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

"""Micro-benchmark: compact quotient rows (256B [q|ecaux]) vs the current
512B [hi|lo|ecaux|meta] slab rows, at config-1 and config-2 table scales.

Decides whether the quotient layout (store a 32-bit remainder of an
invertible 50-bit key hash instead of the full hi/lo key) pays: it halves
both the table working set and the gathered bytes per lane, at the cost of
requiring >= 2^19 buckets (quotient must fit 31 bits + slot-0 FULL sign bit).

Honest-protocol timing (docs/PERFORMANCE.md): jit once, distinct
pre-uploaded index arrays per step, slope between n and 2n enqueued steps,
each timed region ended by a small VALUE READBACK (block_until_ready alone
has measured 0.12 ms for a 33 ms gather on this tunnel).

Run single-process on the real chip:  python benchmarks/micro_quotient.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 5_000_000  # probe lanes per step (config scale: 65536 reads x 76 windows)


def main():
    import jax
    import jax.numpy as jnp

    log = lambda *a: print(*a, file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)

    def slope(name, fn, tb, idx_arrays, n1=3, n2=6):
        f = jax.jit(fn)
        # warmup (compile) + one spare
        np.asarray(f(tb, idx_arrays[0])[:8])

        def run(n, offset):
            t0 = time.perf_counter()
            outs = [f(tb, idx_arrays[(offset + i) % len(idx_arrays)])
                    for i in range(n)]
            np.asarray(outs[-1][:8])  # value readback, not just ready-flag
            return time.perf_counter() - t0

        t1 = run(n1, 1)
        t2 = run(n2, 1 + n1)
        per = (t2 - t1) / (n2 - n1)
        log(f"{name:58s} {per*1e3:9.2f} ms/step  {N/per/1e6:7.1f} Mlane/s")
        return per

    def uploads(nb, reps=7):
        out = [jnp.asarray(rng.integers(0, nb, size=N, dtype=np.int32))
               for _ in range(reps)]
        jax.block_until_ready(out)
        return out

    # the probe's actual consumption pattern: key-slab compare + ecaux
    # select-max (full row consumed)
    def probe_512(tb, ix):
        rows = tb[ix]  # (N, 128)
        G = 32
        hi = ix * 7 + 1
        lo = ix * 13 + 5
        match = (rows[:, :G] == hi[:, None]) & (rows[:, G:2 * G] == lo[:, None])
        ecaux = jnp.max(jnp.where(match, rows[:, 2 * G:3 * G], -1), axis=1)
        full = rows[:, 3 * G] > 0
        return ecaux + full

    def probe_256(tb, ix):
        rows = tb[ix]  # (N, 64)
        G = 32
        q = ix * 7 + 1
        match = (rows[:, :G] & 0x7FFFFFFF) == q[:, None]
        ecaux = jnp.max(jnp.where(match, rows[:, G:2 * G], -1), axis=1)
        full = rows[:, 0] < 0
        return ecaux + full

    for tag, nb in (("config1-ish 2^18", 1 << 18),
                    ("config1-ish 2^19", 1 << 19),
                    ("config2       2^21", 1 << 21)):
        idx = uploads(nb)
        mb512 = nb * 512 // (1 << 20)
        tb = jnp.asarray(rng.integers(0, 1 << 20, size=(nb, 128),
                                      dtype=np.int32))
        slope(f"{tag} 512B [hi|lo|ecaux|meta]  ({mb512:5d}MB)", probe_512,
              tb, idx)
        del tb
        tb = jnp.asarray(rng.integers(0, 1 << 20, size=(nb, 64),
                                      dtype=np.int32))
        slope(f"{tag} 256B [q|ecaux]           ({mb512 // 2:5d}MB)",
              probe_256, tb, idx)
        del tb, idx


if __name__ == "__main__":
    main()

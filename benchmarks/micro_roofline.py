"""Roofline micro for the probe gather (round-4 verdict item 1c): what is
the bucket gather's achieved rate vs this chip's HBM peak, and could
locality (sorted / radix-binned lane order) buy anything (item 1b)?

Measures, at config-1-scale (~40MB) and GENCODE-scale (~1GB) tables:
  * full-row-consumed bucket gather, 5M lanes: random / sorted / binned
    lane order (binning = stable sort by the top 8 or 12 bucket bits —
    the coalescing an O(N) radix binning pass could at best achieve);
  * the device-side cost of PRODUCING a binned order (argsort of the top
    bits + scatter of hi/lo/idx lanes) — what binning would have to pay;
  * derived effective GB/s and Mlane/s against the v5e HBM reference
    (~819 GB/s) -> the roofline statement for docs/PERFORMANCE.md.

Protocol: slope (time n and 2n enqueued steps, one value readback each,
difference cancels the ~22ms tunnel sync cost), distinct pre-uploaded
index arrays cycled per step, jit once (docs/PERFORMANCE.md measurement
methodology).

Run (real chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/micro_roofline.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 5_000_000
HBM_PEAK_GBS = 819.0  # v5e spec number, reference line only


def main():
    import jax
    import jax.numpy as jnp

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    log(f"[roofline] devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def slope(name, fn, feeds, per_step_lanes=N, row_bytes=512):
        f = jax.jit(fn)
        out = f(*feeds[0])
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:8])

        def run(m):
            t0 = time.perf_counter()
            o = None
            for i in range(m):
                o = f(*feeds[i % len(feeds)])
            np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:8])
            return time.perf_counter() - t0

        run(2)  # settle
        n = 4
        t_n, t_2n = run(n), run(2 * n)
        dt = (t_2n - t_n) / n
        gbs = per_step_lanes * row_bytes / dt / 1e9
        log(f"{name:44s} {dt*1e3:8.2f} ms  "
            f"{per_step_lanes/dt/1e6:7.1f} Mlane/s  {gbs:6.1f} GB/s "
            f"({100*gbs/HBM_PEAK_GBS:4.1f}% of HBM peak)")
        return dt

    sizes = ([int(a) for a in sys.argv[1:]] if len(sys.argv) > 1
             else (40, 1024))
    for mb in sizes:
        NB = (mb << 20) // 512  # 32-slot buckets, 512B (128-int32) rows
        # generate the table ON DEVICE: contents are irrelevant to gather
        # timing, and a 1GB H2D through this tunnel stalls for tens of
        # minutes (two timed-out attempts, 2026-08-21)
        tb = jax.jit(lambda: jax.random.randint(
            jax.random.PRNGKey(0), (NB, 128), 0, 1 << 20, jnp.int32))()
        np.asarray(tb[0, :4])
        log(f"\n[roofline] table {mb}MB ({NB} buckets, device-generated)")

        def feeds_for(transform=None, k=4):
            out = []
            for j in range(k):
                ix = rng.integers(0, NB, size=N, dtype=np.int32)
                arr = jnp.asarray(transform(ix) if transform else ix)
                np.asarray(arr[:4])  # force the upload now, one at a time
                log(f"  [roofline] feed {j+1}/{k} uploaded")
                out.append((arr,))
            return out

        # the table is an ARGUMENT, never a closure: closed-over arrays
        # are baked into the program as constants and shipped to the
        # remote compiler (documented HTTP-413 / multi-minute-stall
        # failure at GB scale — docs/PERFORMANCE.md)
        fullrow = lambda t, ix: t[ix].sum(axis=1)

        def with_tb(feeds):
            return [(tb, f[0]) for f in feeds]

        shift8 = max(int(NB - 1).bit_length() - 8, 0)
        shift12 = max(int(NB - 1).bit_length() - 12, 0)
        slope("full-row gather, random order", fullrow,
              with_tb(feeds_for()))
        slope("full-row gather, sorted order", fullrow,
              with_tb(feeds_for(np.sort)))
        slope("full-row gather, binned 256", fullrow,
              with_tb(feeds_for(lambda ix: ix[np.argsort(ix >> shift8,
                                                         kind="stable")])))
        slope("full-row gather, binned 4096", fullrow,
              with_tb(feeds_for(lambda ix: ix[np.argsort(ix >> shift12,
                                                         kind="stable")])))

        # what producing a binned order costs ON DEVICE: one 8-bit-key sort
        # of the lane ids (the radix-binning candidate XLA actually offers
        # is lax.sort over the top bits), payload = the 3 lane arrays that
        # would ride along (hi, lo, original position)
        def bin_cost(ix):
            key = (ix >> shift8).astype(jnp.int32)
            _, h, l, p = jax.lax.sort(
                (key, ix, ix, jnp.arange(N, dtype=jnp.int32)),
                num_keys=1)
            return h + l + p

        slope("device binning (sort top-8 bits + 3 payloads)",
              bin_cost, feeds_for(), row_bytes=16)

        # and the cheapest conceivable alternative: one N-lane int32
        # scatter (any binning scheme pays at least one reorder pass)
        def scatter_cost(ix):
            return jnp.zeros(N, jnp.int32).at[ix % N].set(ix)

        slope("one N-lane int32 scatter (reorder floor)",
              scatter_cost, feeds_for(), row_bytes=8)
        del tb


if __name__ == "__main__":
    main()

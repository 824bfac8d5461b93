"""Bisect the signature-accumulate stage (map/signature.py accumulate).

profile_map measured accumulate at 6.5 ms (config-1) / 19.6 ms (config-2
world, sig_table_bits=20) per 65536-lane batch — large for a stage whose
per-round work is one 65k-lane gather of an 8MB key table. Variants:

  A  full accumulate (baseline, donated table)
  B  fingerprint only
  C  + home hash + one key-row gather + match compare (no loop)
  D  full accumulate minus the sig-row scatter
  E  full accumulate minus the count scatter-add
  F  full accumulate with sig_probe=4 (fewer max rounds, same steady state)

Feeds are REPLAYED batches after a warm-up pass that seeds the table, so
the steady state (all signatures already claimed) dominates, as in
production. Run single-process on the real chip (cached config-2 index):
  python benchmarks/micro_acc.py [--bits 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=20)
    ap.add_argument("--isoform", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from benchmarks.configs import _world
    from seekmer_tpu.config import MapConfig
    from seekmer_tpu.map.driver import DeviceIndex
    from seekmer_tpu.map.signature import (
        accumulate, fingerprint, make_sig_table, read_signatures,
    )
    from seekmer_tpu.ops.hash import sig_slot_hash
    from seekmer_tpu.ops.kmer_pack import pack_canonical
    from seekmer_tpu.ops.probe import lookup_ecs
    from seekmer_tpu.utils.simulate import simulate_packed_batches

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng, index, seqs, _ = _world(60000, isoform=True)
    di = DeviceIndex.from_host(index)
    cfg = MapConfig(batch_size=65536, sig_table_bits=args.bits)
    B, L, NBATCH = 65536, 100, 8
    codes, _ = simulate_packed_batches(rng, seqs, NBATCH, B, read_len=L)
    lengths = jnp.full(B, L, jnp.int32)
    weights = jnp.ones(B, jnp.int32)
    k = index.k
    C = cfg.max_ecs_per_read

    # precompute signatures on device once (isolate accumulate from probe)
    @jax.jit
    def to_sig(tb, st, c):
        hi, lo, valid = pack_canonical(c, lengths, k)
        ecs = lookup_ecs(hi, lo, valid, tb, di.main_slots, st,
                         di.stash_slots, di.bucket)
        return read_signatures(ecs, valid, C)

    sigs = []
    for c in codes:
        s, m = to_sig(di.table, di.stash, jnp.asarray(c))
        sigs.append((s, m))
    jax.block_until_ready([s for s, _ in sigs])

    def variant_B(table, sig, mapped):
        fp1, fp2 = fingerprint(sig)
        return table._replace(overflow=table.overflow + fp1.sum() + fp2.sum())

    def variant_C(table, sig, mapped):
        NBK = table.key.shape[0] - 1
        fp1, fp2 = fingerprint(sig)
        home = (sig_slot_hash(fp1.astype(jnp.uint32), fp2.astype(jnp.uint32))
                & jnp.uint32(NBK - 1)).astype(jnp.int32)
        rows = table.key[home]  # (B, KB, 2) bucket row
        match = ((rows[:, :, 0] == fp1[:, None])
                 & (rows[:, :, 1] == fp2[:, None])).any(axis=1)
        return table._replace(overflow=table.overflow + match.sum())

    def bench(name, fn, probe=32):
        table = make_sig_table(args.bits, C)
        f = jax.jit(fn, donate_argnums=(0,))
        # seed: two passes over all batches so every signature is claimed
        for _ in range(2):
            for s, m in sigs:
                table = f(table, s, m)
        np.asarray(table.count[:8])
        n = 3

        def run(m_, o):
            nonlocal table
            t0 = time.perf_counter()
            for i in range(m_):
                s, mm = sigs[(o + i) % NBATCH]
                table = f(table, s, mm)
            np.asarray(table.count[:8])
            return time.perf_counter() - t0

        run(1, 0)
        t_n, t_2n = run(n, 0), run(2 * n, n)
        dt = (t_2n - t_n) / n
        log(f"{name:46s} {dt*1e3:8.2f} ms/batch")
        return dt

    def full(probe):
        def f(table, sig, mapped):
            return accumulate(table, sig, mapped, weights=weights,
                              sig_probe=probe)
        return f

    bench("A full accumulate (sig_probe=32)", full(32))
    bench("B fingerprint only", variant_B)
    bench("C + home gather + match", variant_C)
    bench("F full accumulate (sig_probe=4)", full(4))
    bench("A again (drift check)", full(32))


if __name__ == "__main__":
    main()

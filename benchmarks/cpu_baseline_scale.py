#!/usr/bin/env python
"""Single-core compiled CPU baseline at GENCODE scale (config-2 world).

bench.py measures the compiled C baseline on the config-1 index (~30 MB
hash table), where the CPU's cache hierarchy holds most of the table and
one core maps ~0.5M reads/s. The reference-class workload is config 2:
~27M k-mers -> ~0.7 GB hash table, where every probe is a DRAM-latency
random read. This script measures that rate so the 10x-per-chip
comparison (BASELINE.json:5) can be read at BOTH scales. CPU-only — safe
to run while the chip is busy.

Usage: python benchmarks/cpu_baseline_scale.py [--transcripts 60000]
(index cached in $SEEKMER_BENCH_CACHE, shared with configs.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", type=int, default=60000)
    ap.add_argument("--reads", type=int, default=30000)
    ap.add_argument("--read-len", type=int, default=100)
    args = ap.parse_args()

    from benchmarks.configs import _world
    from seekmer_tpu.native.cpu_baseline import CpuBaselineMapper, get_lib
    from seekmer_tpu.utils.simulate import simulate_packed_batches

    if get_lib() is None:
        print(json.dumps({"error": "no C toolchain"}))
        return 1
    rng, index, seqs, build_s = _world(args.transcripts, isoform=True)
    codes, _ = simulate_packed_batches(rng, seqs, 1, args.reads,
                                       read_len=args.read_len)
    rates = {}
    for use_skip in (False, True):
        m = CpuBaselineMapper(index, sig_bits=20)
        m.map(codes[0][:512], use_skip=use_skip)  # warm table/predictors
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            mapped = m.map(codes[0], use_skip=use_skip)
            best = max(best, args.reads / (time.perf_counter() - t0))
        rates[use_skip] = best
        m.close()
    rate = rates[False]
    size = 64
    while size < 2 * index.num_kmers:
        size <<= 1
    table_mb = size * 12 / 1e6  # the C baseline's own open table
    print(json.dumps({
        "metric": "cpu_1core_compiled_reads_per_s_gencode",
        "value": round(rate, 1),
        "unit": "reads/s",
        "extra": {
            # the reference's own contig-match-length skipping heuristic
            # (SURVEY.md 3.3) in the same compiled loop — the strongest
            # single-core stand-in; signature-exact up to the
            # ~1e-7/window error-collision caveat
            "cpu_1core_with_skip_reads_per_s": round(rates[True], 1),
            "kmers": index.num_kmers,
            "transcripts": index.num_transcripts,
            "baseline_table_mb": round(table_mb, 1),
            "mapped_fraction": mapped / args.reads,
            "reads": args.reads,
            "read_len": args.read_len,
        },
    }))
    m.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())

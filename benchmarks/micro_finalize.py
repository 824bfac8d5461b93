"""Host finalize micro-benchmark (VERDICT round-1 item 6): merge_sig_rows
and resolve_signatures at high signature diversity — GENCODE-scale
paired-end runs produce ~1M distinct signatures, and round 1's dict-loop
finalize was unmeasured there.

  python benchmarks/micro_finalize.py [--signatures 1000000]
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
    ap.add_argument("--signatures", type=int, default=1_000_000)
    ap.add_argument("--transcripts", type=int, default=4000)
    ap.add_argument("--multi-frac", type=float, default=0.05,
                    help="fraction of signatures with >1 EC")
    args = ap.parse_args()

    from seekmer_tpu.index.build import build_index_from_seqs
    from seekmer_tpu.map.driver import merge_sig_rows, resolve_signatures
    from seekmer_tpu.utils.simulate import random_transcriptome

    rng = np.random.default_rng(3)
    names, seqs = random_transcriptome(
        rng, num_transcripts=args.transcripts, min_len=300, max_len=1500,
        shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)
    E = index.num_ecs

    U = args.signatures
    C = 16
    pad = np.int32(0x7FFFFFFF)
    sig = np.full((U, C), pad, np.int32)
    sig[:, 0] = rng.integers(0, E, U)
    multi = rng.random(U) < args.multi_frac
    sig[multi, 1] = rng.integers(0, E, int(multi.sum()))
    sig[multi] = np.sort(sig[multi], axis=1)
    # duplicate rows exist by construction (U >> E combinations drawn)
    count = rng.integers(1, 50, U).astype(np.int32)

    t0 = time.perf_counter()
    res = merge_sig_rows(sig, count, int(count.sum()), 0)
    t_merge = time.perf_counter() - t0

    t0 = time.perf_counter()
    members, counts, dropped = resolve_signatures(res, index)
    t_resolve = time.perf_counter() - t0

    print(json.dumps({
        "metric": "finalize_signatures_per_s",
        "value": round(U / (t_merge + t_resolve), 1),
        "unit": "signatures/s",
        "extra": {
            "signatures": U,
            "distinct_after_merge": int(res.sigs.shape[0]),
            "merge_s": round(t_merge, 3),
            "resolve_s": round(t_resolve, 3),
            "final_ecs": len(members),
            "dropped": dropped,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

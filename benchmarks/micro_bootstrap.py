"""GENCODE-scale batched-bootstrap EM benchmark (the config-5 CSR path).

Builds the EC table straight from the cached isoform index's own EC
structure (E ~ 118k, nnz ~ index membership total) with Zipf-ish counts —
no mapping run needed — then times run_bootstrap's batched CSR EM.

Context (docs/PERFORMANCE.md): single-run GENCODE EM ~29 ms/iter; the
old flattened batched CSR paid B*nnz lanes/iter (~100x that). The
replicate-major form keeps nnz lanes with (nnz, B) rows, so the target is
a per-iteration cost close to the single-run's.

Run single-process on the real chip:  python benchmarks/micro_bootstrap.py
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
    from seekmer_tpu.config import EMConfig
    from seekmer_tpu.em import bootstrap as bs
    from seekmer_tpu.em.em import build_ec_table, run_em

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    rng, index, seqs, _ = _world(60000, isoform=True)
    E = index.num_ecs
    members = [index.ec_members(e) for e in range(E)]
    counts = (1000.0 / (1.0 + np.arange(E))) ** 0.7 * 100
    rng.shuffle(counts)
    ec = build_ec_table(members, counts, index.num_transcripts)
    nnz = int(ec.txp_ids.shape[0])
    log(f"E={E} T={index.num_transcripts} nnz={nnz}")

    # single-run reference: iterations/s at fixed blocks
    cfg1 = EMConfig(max_iters=64, min_iters=64, rel_tol=0.0)
    alpha, it = run_em(ec, index.lengths, cfg1)
    np.asarray(alpha[:8])
    t0 = time.perf_counter()
    alpha, it = run_em(ec, index.lengths, cfg1)
    np.asarray(alpha[:8])
    dt1 = (time.perf_counter() - t0) / int(it)
    log(f"single-run EM: {dt1*1e3:.2f} ms/iter")

    for B in (16, 100):
        cfg = EMConfig(bootstrap_samples=B, bootstrap_seed=1,
                       max_iters=64, min_iters=64, rel_tol=0.0)
        boot = bs.run_bootstrap(ec, index.lengths, cfg)
        np.asarray(boot[:1, :8])
        cfg2 = EMConfig(bootstrap_samples=B, bootstrap_seed=2,
                        max_iters=64, min_iters=64, rel_tol=0.0)
        t0 = time.perf_counter()
        boot = bs.run_bootstrap(ec, index.lengths, cfg2)
        np.asarray(boot[:1, :8])
        dt = time.perf_counter() - t0
        log(f"batched B={B:4d}: {dt:.2f} s total, "
            f"{dt/64*1e3:.2f} ms/iter-of-batch, "
            f"{dt/64/B*1e6:.1f} us/replicate-iter, "
            f"{B*64/dt:.0f} replicate-iters/s")


if __name__ == "__main__":
    main()

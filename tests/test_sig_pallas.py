"""Pallas signature (EC-intersection) kernel vs the XLA read_signatures."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from seekmer_tpu.map.signature import read_signatures
from seekmer_tpu.ops.sig_pallas import read_signatures_pallas


def _both(ecs, valid, C, block=8):
    sig_x, map_x = read_signatures(jnp.asarray(ecs), jnp.asarray(valid), C)
    sig_p, map_p = read_signatures_pallas(jnp.asarray(ecs),
                                          jnp.asarray(valid), C,
                                          block=block, interpret=True)
    np.testing.assert_array_equal(np.asarray(sig_x), np.asarray(sig_p))
    np.testing.assert_array_equal(np.asarray(map_x), np.asarray(map_p))
    return np.asarray(sig_p), np.asarray(map_p)


def test_random_lanes(rng):
    B, P, C = 24, 76, 8
    ecs = rng.integers(-1, 40, size=(B, P)).astype(np.int32)
    valid = rng.random((B, P)) < 0.8
    _both(ecs, valid, C)


def test_no_hits_and_complex_reads(rng):
    B, P, C = 16, 50, 4
    ecs = rng.integers(0, 1000, size=(B, P)).astype(np.int32)  # likely > C
    ecs[0] = -1                      # zero hits -> unmapped
    ecs[1] = 7                       # single EC everywhere
    valid = np.ones((B, P), bool)
    valid[2] = False                 # all-invalid -> unmapped
    sig, mapped = _both(ecs, valid, C)
    assert not mapped[0] and not mapped[2]
    assert mapped[1] and sig[1, 0] == 7


def test_wide_window_axis(rng):
    """P > 128 exercises the W=256 bitonic network."""
    B, P, C = 8, 200, 16
    ecs = rng.integers(-1, 25, size=(B, P)).astype(np.int32)
    valid = rng.random((B, P)) < 0.9
    _both(ecs, valid, C)


def test_mapper_sig_backend_matches_xla(rng):
    """Full Mapper run with sig_backend=pallas == the xla backend."""
    from seekmer_tpu.config import MapConfig
    from seekmer_tpu.index.build import build_index_from_seqs
    from seekmer_tpu.io.fastq import ReadBatch
    from seekmer_tpu.map.driver import Mapper
    from seekmer_tpu.utils.simulate import (
        random_transcriptome, simulate_packed_batches)

    names, seqs = random_transcriptome(
        rng, num_transcripts=50, min_len=150, max_len=400,
        shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)
    B, L = 128, 100
    codes, _ = simulate_packed_batches(rng, seqs, 2, B, read_len=L,
                                       error_rate=0.01)
    lengths = np.full(B, L, np.int32)
    w = np.ones(B, np.int32)
    results = {}
    for backend in ("xla", "pallas"):
        cfg = MapConfig(batch_size=B, sig_table_bits=12, sig_backend=backend)
        mapper = Mapper(index, cfg)
        res = mapper.run(ReadBatch(codes[i], lengths, w) for i in range(2))
        results[backend] = {
            tuple(r.tolist()): int(n)
            for r, n in zip(res.sigs, res.sig_counts)
        }
    assert results["pallas"] == results["xla"]


def test_exactly_c_distinct(rng):
    B, P, C = 4, 30, 5
    ecs = np.tile(np.arange(5, dtype=np.int32), (B, 6))
    valid = np.ones((B, P), bool)
    sig, mapped = _both(ecs, valid, C)
    assert mapped.all()
    np.testing.assert_array_equal(sig[0], np.arange(5))

"""Mixed read lengths across buckets: bucket-padded batching must agree
with the oracle exactly (SURVEY.md 7.5 item 5: variable read lengths are
bucket-padded to a few static lengths)."""

import numpy as np
import pytest

from seekmer_tpu.config import EMConfig, MapConfig, PipelineConfig
from seekmer_tpu.models.quantifier import Quantifier
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_reads
from tests.oracle import oracle


def test_mixed_length_reads_match_oracle():
    rng = np.random.default_rng(31)
    names, seqs = random_transcriptome(rng, num_transcripts=30,
                                      shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)

    reads = []
    for L in (36, 50, 75, 100, 150, 24):  # incl. one below k -> unmapped
        sim = simulate_reads(rng, seqs, num_reads=80, read_len=L,
                             error_rate=0.01)
        reads.extend(sim.reads1)
    rng.shuffle(reads)

    map_cfg = MapConfig(batch_size=64, sig_table_bits=12)
    em_cfg = EMConfig(rel_tol=1e-6)
    q = Quantifier(index, PipelineConfig().replace(map=map_cfg, em=em_cfg))
    res = q.quantify_reads(reads)
    o = oracle.quantify(reads, index, map_cfg, em_cfg)

    assert res.total_reads == len(reads)
    assert res.unmapped == o["unmapped"]
    np.testing.assert_allclose(res.est_counts, o["est_counts"],
                               rtol=5e-3, atol=5e-2)

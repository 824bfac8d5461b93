"""Fragment-length distribution estimation (map/fld.py): device vs the
float64 oracle, and recovery of the simulated FLD (VERDICT round-1 item 2;
SURVEY.md 3.4 pins the effective-length model's FLD inputs as open
parameters — estimating them from the data removes the guess)."""

import numpy as np
import pytest

from seekmer_tpu.config import EMConfig, IndexConfig, MapConfig
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.io.fastq import ReadBatch
from seekmer_tpu.map.driver import DeviceIndex, Mapper
from seekmer_tpu.map.fld import DEFAULT_OFFSETS, FLDEstimator
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_packed_pairs
from tests.oracle import oracle as orc

MEAN, SD, L = 250.0, 25.0, 100


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    names, seqs = random_transcriptome(
        rng, num_transcripts=60, min_len=600, max_len=3000)
    index = build_index_from_seqs(names, seqs)
    c1, c2, _ = simulate_packed_pairs(
        rng, seqs, num_batches=2, batch_size=2048, read_len=L,
        mean_frag=MEAN, sd_frag=SD, error_rate=0.003)
    return index, seqs, c1, c2


def _batches(c1, c2):
    B = c1.shape[1]
    lengths = np.full(B, L, np.int32)
    w = np.ones(B, np.int32)
    return [ReadBatch(codes=c1[i], lengths=lengths, weights=w,
                      codes2=c2[i], lengths2=lengths)
            for i in range(c1.shape[0])]


def test_index_fld_payload(setup):
    index, seqs, _, _ = setup
    assert index.fld_tid is not None
    assert index.fld_tid.shape == (index.main_slots + index.stash_slots,)
    # spot-check a few payload entries against the oracle dict
    fdict = orc.build_fld_dict(seqs, index.k)
    from seekmer_tpu.encoding import join_key

    occ = index.table[:, 0] >= 0
    keys = join_key(index.table[occ, 0], index.table[occ, 1], index.k)
    tid = index.fld_tid[: index.main_slots][occ]
    pos = index.fld_pos[: index.main_slots][occ]
    n_checked = 0
    for key, t, p in zip(keys[:5000].tolist(), tid[:5000], pos[:5000]):
        hit = fdict.get(key)
        if t >= 0:
            assert hit == (int(t), int(p))
            n_checked += 1
        else:
            assert hit is None
    assert n_checked > 100


def test_device_hist_matches_oracle(setup):
    index, seqs, c1, c2 = setup
    # exact parity requires every k-mer reachable from the main table
    assert int((index.stash[:, 0] >= 0).sum()) == 0, "fixture grew a stash"
    di = DeviceIndex.from_host(index)
    est = FLDEstimator(index, di, sample_batches=2)
    for b in _batches(c1, c2):
        est.feed(b)
    dev_hist = np.asarray(est.hist).copy()
    dev_hist[0] = 0

    fdict = orc.build_fld_dict(seqs, index.k)
    orc_hist = np.zeros_like(dev_hist, dtype=np.int64)
    for i in range(c1.shape[0]):
        orc_hist += orc.estimate_fld(c1[i], c2[i], fdict, index.k,
                                     offsets=DEFAULT_OFFSETS,
                                     max_len=dev_hist.size - 1)
    np.testing.assert_array_equal(dev_hist.astype(np.int64), orc_hist)


def test_estimate_recovers_simulated_fld(setup):
    index, _, c1, c2 = setup
    di = DeviceIndex.from_host(index)
    est = FLDEstimator(index, di, sample_batches=2)
    for b in _batches(c1, c2):
        est.feed(b)
    assert not est.active
    mean, sd, n = est.estimate()
    assert n > 1000
    assert abs(mean - MEAN) < 10.0, (mean, n)
    assert abs(sd - SD) < 8.0, (sd, n)


def test_quantifier_applies_estimate(setup):
    index, _, c1, c2 = setup
    from seekmer_tpu.config import PipelineConfig
    from seekmer_tpu.models.quantifier import Quantifier

    cfg = PipelineConfig().replace(
        map=MapConfig(batch_size=2048, sig_table_bits=14, paired_end=True),
        em=EMConfig(estimate_fld=True))
    q = Quantifier(index, cfg)
    res = q.quantify_batches(iter(_batches(c1, c2)))
    assert res.fld_mean is not None
    assert abs(res.fld_mean - MEAN) < 10.0
    assert res.fld_samples > 1000
    # the estimated model must actually drive effective lengths
    em_cfg = EMConfig(mean_fragment_length=res.fld_mean,
                      fragment_length_sd=res.fld_sd)
    expect = orc.effective_lengths(index.lengths, em_cfg)
    np.testing.assert_allclose(res.eff_length, expect, rtol=1e-4)


def test_estimate_none_for_single_end(setup):
    index, _, c1, _ = setup
    from seekmer_tpu.config import PipelineConfig
    from seekmer_tpu.models.quantifier import Quantifier

    cfg = PipelineConfig().replace(
        map=MapConfig(batch_size=2048, sig_table_bits=14))
    q = Quantifier(index, cfg)
    B = c1.shape[1]
    batches = [ReadBatch(codes=c1[0], lengths=np.full(B, L, np.int32),
                         weights=np.ones(B, np.int32))]
    res = q.quantify_batches(iter(batches))
    assert res.fld_mean is None


def test_fld_with_data_parallel_mapper(setup):
    """FLD estimation composes with the DP mapper's replicated device
    index (mixed shardings: mesh-replicated table + uncommitted batch)."""
    index, _, c1, c2 = setup
    from seekmer_tpu.config import PipelineConfig, ShardConfig
    from seekmer_tpu.models.quantifier import Quantifier

    cfg = PipelineConfig().replace(
        map=MapConfig(batch_size=2048, sig_table_bits=14, paired_end=True),
        em=EMConfig(estimate_fld=True),
        shard=ShardConfig(data_axis=8))
    q = Quantifier(index, cfg)
    res = q.quantify_batches(iter(_batches(c1, c2)))
    assert res.fld_mean is not None
    assert abs(res.fld_mean - MEAN) < 10.0


def test_fld_with_prefix_sharded_mapper(setup):
    """Prefix-sharded mode estimates FLD from shard 0's sub-table (an
    unbiased 1/n_shards key sample, owner-filtered sampling)."""
    index, _, c1, c2 = setup
    from seekmer_tpu.config import PipelineConfig, ShardConfig
    from seekmer_tpu.models.quantifier import Quantifier

    cfg = PipelineConfig().replace(
        map=MapConfig(batch_size=2048, sig_table_bits=14, paired_end=True),
        em=EMConfig(estimate_fld=True),
        shard=ShardConfig(data_axis=2, index_axis=4, index_mode="prefix"))
    q = Quantifier(index, cfg)
    res = q.quantify_batches(iter(_batches(c1, c2)))
    assert res.fld_mean is not None
    assert res.fld_samples > 300
    assert abs(res.fld_mean - MEAN) < 12.0, (res.fld_mean, res.fld_samples)
    assert abs(res.fld_sd - SD) < 10.0

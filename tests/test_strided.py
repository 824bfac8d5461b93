"""Strided probing with EC run-length coverage vs dense probing
(ops/probe.lookup_ecs_strided; the exact-semantics replacement for the
reference mapper's skipping heuristic, SURVEY.md 3.3/7.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seekmer_tpu import encoding as enc
from seekmer_tpu.config import MapConfig
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.io.fastq import batch_reads
from seekmer_tpu.map.driver import Mapper
from seekmer_tpu.map.signature import SIG_PAD
from seekmer_tpu.ops.kmer_pack import pack_canonical
from seekmer_tpu.ops.probe import lookup_ecs, lookup_ecs_strided
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_reads


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(13)
    names, seqs = random_transcriptome(
        rng, num_transcripts=40, min_len=200, max_len=900,
        shared_prefix_frac=0.6,
    )
    index = build_index_from_seqs(names, seqs)
    return index, seqs


def _pack_reads(reads, k):
    L = max(len(r) for r in reads)
    codes = np.full((len(reads), L), 4, np.uint8)
    lengths = np.zeros(len(reads), np.int32)
    for i, r in enumerate(reads):
        c = enc.seq_to_codes(r)
        codes[i, : c.size] = c
        lengths[i] = c.size
    return pack_canonical(jnp.asarray(codes), jnp.asarray(lengths), k)


@pytest.mark.parametrize("stride", [2, 4, 8])
@pytest.mark.parametrize("error_rate", [0.0, 0.02])
def test_strided_vs_dense_invariants(world, stride, error_rate):
    """Error-free: identical lanes. With errors, the only permitted
    divergence is a fill assigning a neighboring sample's EC where dense
    sees MISS (an error window; the signature is unaffected because that
    EC is already contributed by the sample itself). Wherever dense HAS an
    EC, strided must agree."""
    index, seqs = world
    rng = np.random.default_rng(5)
    sim = simulate_reads(rng, seqs, num_reads=300, read_len=100,
                         error_rate=error_rate)
    hi, lo, valid = _pack_reads(sim.reads1, index.k)
    from seekmer_tpu.ops.probe import device_table_layout

    args = (jnp.asarray(device_table_layout(index.table, index.bucket)),
            index.main_slots,
            jnp.asarray(device_table_layout(index.stash, index.bucket)),
            index.stash_slots, index.bucket)
    dense = np.asarray(lookup_ecs(hi, lo, valid, *args))
    strided = np.asarray(
        lookup_ecs_strided(hi, lo, valid, *args, stride))
    v = np.asarray(valid)
    if error_rate == 0.0:
        np.testing.assert_array_equal(strided[v], dense[v])
    # dense hit => strided agrees (never hides or changes an EC)
    hitmask = v & (dense >= 0)
    np.testing.assert_array_equal(strided[hitmask], dense[hitmask])
    # divergent lanes are exactly fills over dense misses
    div = v & (strided != dense)
    assert (dense[div] == -1).all()
    assert (strided[div] >= 0).all()
    # filled ECs come from the same read's dense hit set
    B = dense.shape[0]
    for b in np.unique(np.nonzero(div)[0]):
        read_ecs = set(dense[b][v[b] & (dense[b] >= 0)].tolist())
        filled = set(strided[b][div[b]].tolist())
        assert filled <= read_ecs, (b, filled, read_ecs)
    assert (strided[~v] == -1).all()


def test_mapper_strided_matches_dense(world):
    index, seqs = world
    rng = np.random.default_rng(6)
    sim = simulate_reads(rng, seqs, num_reads=500, read_len=100,
                         error_rate=0.01)
    reads_b = [r.encode() for r in sim.reads1]

    def run(stride):
        cfg = MapConfig(batch_size=128, sig_table_bits=12,
                        probe_stride=stride)
        res = Mapper(index, cfg).run(batch_reads(reads_b, cfg))
        return {
            tuple(r[r != int(SIG_PAD)].tolist()): int(n)
            for r, n in zip(res.sigs, res.sig_counts)
        }

    assert run(8) == run(1)


def test_run_length_aux_is_safe(world):
    """aux d must never overstate a run: for every indexed k-mer occurrence,
    the d following/preceding windows have the same EC."""
    index, seqs = world
    from seekmer_tpu.index.build import (
        collect_kmer_pairs, group_equivalence_classes, compute_run_lengths,
    )

    keys, tids, _ = collect_kmer_pairs(seqs, index.k)
    uk, key_ec, _, _ = group_equivalence_classes(keys, tids)
    d_min = compute_run_lengths(seqs, uk, key_ec, index.k)

    for seq in seqs[:5]:
        kk, valid = enc.canonical_kmers(enc.seq_to_codes(seq), index.k)
        ki = np.searchsorted(uk, kk)
        ec = np.where(valid, key_ec[np.minimum(ki, uk.size - 1)], -1)
        for p in range(kk.size):
            if not valid[p]:
                continue
            d = int(d_min[ki[p]])
            for q in range(max(0, p - d), min(kk.size, p + d + 1)):
                assert ec[q] == ec[p], (p, q, d)

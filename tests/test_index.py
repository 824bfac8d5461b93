"""Index builder tests: hash build/probe round-trip + EC grouping
(SURVEY.md section 4 item 2)."""

import numpy as np
import pytest

from seekmer_tpu import encoding as enc
from seekmer_tpu.config import IndexConfig
from seekmer_tpu.index import build as ib
from seekmer_tpu.index.store import EMPTY, KMerIndex
from seekmer_tpu.ops.hash import hash_kmer, hash_kmer_stash
from seekmer_tpu.utils.simulate import random_transcriptome


def _host_lookup(index: KMerIndex, key64: int) -> int:
    """Pure-numpy 2-choice bucket lookup (mirrors the device gather)."""
    hi, lo = enc.split_key(np.array([key64], np.uint64), index.k)
    G = index.bucket
    for table, slots, fn in (
        (index.table, index.main_slots, hash_kmer),
        (index.stash, index.stash_slots, hash_kmer_stash),
    ):
        nb = slots // G
        hb = int(fn(hi.view(np.uint32), lo.view(np.uint32))[0]
                 & np.uint32(nb - 1))
        for d in range(G):
            row = table[hb * G + d]
            if row[0] == hi[0] and row[1] == lo[0]:
                return int(row[2])
    return -1


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(7)
    names, seqs = random_transcriptome(rng, num_transcripts=30, min_len=100,
                                      max_len=500, shared_prefix_frac=0.5)
    cfg = IndexConfig()
    return ib.build_index_from_seqs(names, seqs, cfg=cfg), names, seqs, cfg


def test_ec_membership_exact(small_index):
    """Every k-mer of every transcript must look up to an EC containing
    exactly the set of transcripts that contain that k-mer."""
    index, names, seqs, cfg = small_index
    # ground truth: key -> set of transcript ids
    truth: dict[int, set[int]] = {}
    for tid, seq in enumerate(seqs):
        keys, valid = enc.canonical_kmers(enc.seq_to_codes(seq), cfg.k)
        for kk in keys[valid]:
            truth.setdefault(int(kk), set()).add(tid)

    rng = np.random.default_rng(3)
    sample = rng.choice(list(truth.keys()), size=min(500, len(truth)), replace=False)
    for key in sample:
        ec = _host_lookup(index, int(key))
        assert ec >= 0, "present k-mer must be found"
        members = set(index.ec_members(ec).tolist())
        assert members == truth[int(key)]


def test_absent_kmer_returns_unmapped(small_index):
    index, _, seqs, cfg = small_index
    present = set()
    for seq in seqs:
        keys, valid = enc.canonical_kmers(enc.seq_to_codes(seq), cfg.k)
        present.update(keys[valid].tolist())
    rng = np.random.default_rng(11)
    misses = 0
    while misses < 50:
        key = int(rng.integers(0, 1 << (2 * cfg.k), dtype=np.uint64))
        # canonicalize the probe key the same way reads are
        s = enc.key_to_seq(key, cfg.k)
        keys, _ = enc.canonical_kmers(enc.seq_to_codes(s), cfg.k)
        key = int(keys[0])
        if key in present:
            continue
        assert _host_lookup(index, key) == -1
        misses += 1


def test_save_load_roundtrip(tmp_path, small_index):
    index, names, _, _ = small_index
    p = str(tmp_path / "index.npz")
    index.save(p)
    loaded = KMerIndex.load(p)
    assert loaded.k == index.k
    assert (loaded.table == index.table).all()
    assert (loaded.stash == index.stash).all()
    assert (loaded.ec_offsets == index.ec_offsets).all()
    assert (loaded.ec_transcripts == index.ec_transcripts).all()
    assert loaded.names.tolist() == list(names)
    assert (loaded.lengths == index.lengths).all()


def test_bucket_placement_properties(rng):
    """Every placed key sits inside its home bucket; no slot reused."""
    n = 3000
    keys = np.unique(rng.integers(0, 1 << 50, size=n, dtype=np.uint64))
    hi, lo = enc.split_key(keys, 25)
    vals = np.arange(keys.size, dtype=np.int32)
    nb, G = 64, 8
    table, overflow = ib.build_bucket_table(hi, lo, vals, nb, G, hash_kmer)
    occ = table[:, 0] != EMPTY
    assert int(occ.sum()) + int(overflow.sum()) == keys.size
    # each occupied slot's key hashes to the bucket containing the slot
    slots = np.flatnonzero(occ)
    h = hash_kmer(table[slots, 0].view(np.uint32),
                  table[slots, 1].view(np.uint32)) & np.uint32(nb - 1)
    assert (slots // G == h.astype(np.int64)).all()


def test_overflow_goes_to_stash():
    """High load forces full buckets so overflow keys exercise the stash."""
    rng = np.random.default_rng(5)
    n = 5000
    keys = np.unique(rng.integers(0, 1 << 50, size=n, dtype=np.uint64))
    vals = np.arange(keys.size, dtype=np.int32)
    cfg = IndexConfig(bucket_size=4, load_factor=0.95)
    hi, lo = enc.split_key(keys, 25)
    tables = ib.build_tables(keys, vals, 25, cfg)
    index = KMerIndex(
        k=25, ec_offsets=np.zeros(1, np.int32),
        ec_transcripts=np.zeros(0, np.int32),
        names=np.array([]), lengths=np.zeros(0, np.int32), **tables,
    )
    assert (index.stash[:, 0] != EMPTY).sum() > 0, "expected stash occupancy"
    for i in rng.choice(keys.size, size=200, replace=False):
        assert _host_lookup(index, int(keys[i])) == int(vals[i])


def test_run_length_rank_path_matches_searchsorted(rng):
    """The rank-carrying fast path (position_ranks) must produce exactly
    the searchsorted path's run lengths and table aux bytes."""
    import seekmer_tpu.index.build as ib
    from seekmer_tpu.config import IndexConfig
    from seekmer_tpu.encoding import canonical_kmers
    from seekmer_tpu.utils.simulate import random_transcriptome

    _, seqs = random_transcriptome(rng, num_transcripts=40, min_len=100,
                                   max_len=600, shared_prefix_frac=0.6)
    cfg = IndexConfig()
    codes, starts = ib._concat_codes(seqs)
    all_keys, all_valid = canonical_kmers(codes, cfg.k)
    pos = np.flatnonzero(all_valid)
    keys = all_keys[pos]
    tids = (np.searchsorted(starts, pos, side="right") - 1).astype(np.int32)
    uk, key_ec, eo, et, krank = ib.group_equivalence_classes(
        keys, tids, return_key_rank=True)
    # rank sanity: every pair's rank points at its own key
    np.testing.assert_array_equal(uk[krank], keys)
    d_legacy = ib.compute_run_lengths(seqs, uk, key_ec, cfg.k,
                                      kmer_stream=(all_keys, all_valid))
    d_fast = ib.compute_run_lengths(seqs, uk, key_ec, cfg.k,
                                    kmer_stream=(all_keys, all_valid),
                                    position_ranks=(pos, krank))
    np.testing.assert_array_equal(d_fast, d_legacy)
    t_with = ib.build_tables(uk, key_ec, cfg.k, cfg, aux=d_fast)
    assert (t_with["table"][:, 0] != -1).sum() + \
           (t_with["stash"][:, 0] != -1).sum() == uk.size


def test_native_sort_index_byte_parity(monkeypatch):
    """The C radix-sort core (round 5, hot loop #1) must produce a
    byte-identical index to the numpy sort path — every array compared."""
    from seekmer_tpu.index import build as build_mod
    from seekmer_tpu.native.packer import get_lib
    from seekmer_tpu.utils.simulate import random_transcriptome

    if get_lib() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(9)
    names, seqs = random_transcriptome(rng, num_transcripts=40,
                                       min_len=200, max_len=900,
                                       shared_prefix_frac=0.6)

    monkeypatch.setattr(build_mod, "_NATIVE_SORT_MIN", 1 << 62)
    idx_np = build_mod.build_index_from_seqs(names, seqs)
    monkeypatch.setattr(build_mod, "_NATIVE_SORT_MIN", 0)
    idx_c = build_mod.build_index_from_seqs(names, seqs)

    for attr in ("table", "stash", "ec_offsets", "ec_transcripts",
                 "lengths", "fld_tid", "fld_pos"):
        a, b = getattr(idx_np, attr, None), getattr(idx_c, attr, None)
        if a is None and b is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=attr)

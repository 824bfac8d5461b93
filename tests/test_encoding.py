"""Unit tests for 2-bit encoding and canonical k-mer packing (SURVEY.md
section 4 item 2: encode/canonicalize property tests)."""

import numpy as np
import pytest

from seekmer_tpu import encoding as enc


def test_seq_to_codes_basic():
    codes = enc.seq_to_codes("ACGTacgtN X")
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]


def test_codes_roundtrip():
    s = "ACGTTGCA"
    assert enc.codes_to_seq(enc.seq_to_codes(s)) == s


def test_revcomp():
    codes = enc.seq_to_codes("AACGT")
    assert enc.codes_to_seq(enc.revcomp_codes(codes)) == "ACGTT"
    # invalid stays invalid
    codes = enc.seq_to_codes("ANT")
    assert enc.codes_to_seq(enc.revcomp_codes(codes)) == "ANT"


@pytest.mark.parametrize("k", [5, 25])
def test_canonical_kmers_match_bruteforce(rng, k):
    comp = str.maketrans("ACGT", "TGCA")
    seq = "".join(rng.choice(list("ACGT"), size=80))
    seq = seq[:30] + "N" + seq[31:]
    codes = enc.seq_to_codes(seq)
    keys, valid = enc.canonical_kmers(codes, k)
    assert keys.shape == valid.shape == (len(seq) - k + 1,)
    for p in range(len(seq) - k + 1):
        window = seq[p : p + k]
        if "N" in window:
            assert not valid[p]
            continue
        assert valid[p]
        rc = window[::-1].translate(comp)
        expect = min(window, rc)  # string order == 2-bit numeric order
        assert enc.key_to_seq(keys[p], k) == expect


def test_split_join_key(rng):
    k = 25
    keys = rng.integers(0, 1 << 50, size=100, dtype=np.uint64)
    hi, lo = enc.split_key(keys, k)
    assert hi.dtype == np.int32 and lo.dtype == np.int32
    assert (hi >= 0).all() and (lo >= 0).all()
    assert (enc.join_key(hi, lo, k) == keys).all()
    # lexicographic (hi, lo) order == numeric key order
    order1 = np.argsort(keys)
    order2 = np.lexsort((lo, hi))
    assert (keys[order1] == keys[order2]).all()


def test_canonical_is_strand_invariant(rng):
    k = 25
    seq = "".join(rng.choice(list("ACGT"), size=200))
    comp = str.maketrans("ACGT", "TGCA")
    rc_seq = seq[::-1].translate(comp)
    k1, v1 = enc.canonical_kmers(enc.seq_to_codes(seq), k)
    k2, v2 = enc.canonical_kmers(enc.seq_to_codes(rc_seq), k)
    assert sorted(k1[v1].tolist()) == sorted(k2[v2].tolist())


def test_pack_codes_2bit_roundtrip(rng):
    """Host 2-bit pack -> device unpack is bit-exact, incl. invalid bases
    and non-multiple-of-4/8 lengths (the H2D layout of
    MapConfig.h2d_pack_2bit)."""
    import jax.numpy as jnp

    from seekmer_tpu.encoding import pack_codes_2bit
    from seekmer_tpu.ops.kmer_pack import unpack_codes_2bit

    for L in (1, 7, 8, 37, 64, 100):
        codes = rng.integers(0, 5, size=(16, L)).astype(np.uint8)
        codes[0, :] = 4  # fully invalid row
        packed, bad = pack_codes_2bit(codes)
        assert packed.shape == (16, (L + 3) // 4)
        assert bad.shape == (16, (L + 7) // 8)
        out = np.asarray(unpack_codes_2bit(jnp.asarray(packed),
                                           jnp.asarray(bad), L))
        assert (out == codes).all()

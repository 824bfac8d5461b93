"""Hypothesis property tests for encoding/canonicalization and hashing
(SURVEY.md section 4 item 2 names these explicitly)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from seekmer_tpu import encoding as enc
from seekmer_tpu.ops.hash import hash_kmer, mix32

dna = st.text(alphabet="ACGTacgtN", min_size=25, max_size=120)


@settings(max_examples=80, deadline=None)
@given(dna)
def test_canonical_invariant_under_revcomp(seq):
    """canonical(s) set == canonical(revcomp(s)) set for valid windows."""
    comp = str.maketrans("ACGTacgt", "TGCATGCA")
    rc = seq[::-1].translate(comp)
    k1, v1 = enc.canonical_kmers(enc.seq_to_codes(seq), 25)
    k2, v2 = enc.canonical_kmers(enc.seq_to_codes(rc), 25)
    assert sorted(k1[v1].tolist()) == sorted(k2[v2].tolist())


@settings(max_examples=80, deadline=None)
@given(dna)
def test_canonical_is_minimum(seq):
    comp = str.maketrans("ACGT", "TGCA")
    keys, valid = enc.canonical_kmers(enc.seq_to_codes(seq), 25)
    up = seq.upper()
    for p in np.flatnonzero(valid)[:10]:
        w = up[p : p + 25]
        assert enc.key_to_seq(keys[p], 25) == min(w, w[::-1].translate(comp))


@settings(max_examples=50, deadline=None)
@given(st.integers(0, (1 << 50) - 1))
def test_key_split_join_roundtrip(key):
    arr = np.array([key], np.uint64)
    hi, lo = enc.split_key(arr, 25)
    assert enc.join_key(hi, lo, 25)[0] == key


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_mix32_is_bijective_locally(x):
    """mix32 is a bijection on uint32 (murmur finalizer): distinct nearby
    inputs never collide."""
    a = mix32(np.uint32(x))
    b = mix32(np.uint32((x + 1) % 2**32))
    assert a != b


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**24 - 1), st.integers(0, 2**26 - 1))
def test_hash_kmer_numpy_jax_agree(hi, lo):
    """The build-time (numpy) and device (jax) hash paths must agree bit
    for bit."""
    import jax.numpy as jnp

    h_np = hash_kmer(np.uint32(hi), np.uint32(lo))
    h_jx = np.asarray(hash_kmer(jnp.uint32(hi), jnp.uint32(lo)))
    assert np.uint32(h_np) == np.uint32(h_jx)

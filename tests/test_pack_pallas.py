"""Pallas pack kernel (interpret mode) vs the jnp reference implementation
(SURVEY.md section 4 item 3)."""

import jax.numpy as jnp
import numpy as np

from seekmer_tpu import encoding as enc
from seekmer_tpu.ops.kmer_pack import pack_canonical
from seekmer_tpu.ops.pack_pallas import pack_canonical_pallas


def test_pallas_pack_matches_jnp(rng):
    k = 25
    B, L = 70, 96  # deliberately not a multiple of the block size
    codes = rng.integers(0, 5, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=B).astype(np.int32)
    hi1, lo1, v1 = pack_canonical(jnp.asarray(codes), jnp.asarray(lengths), k)
    hi2, lo2, v2 = pack_canonical_pallas(
        jnp.asarray(codes), jnp.asarray(lengths), k, block=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v1))
    v = np.asarray(v1)
    np.testing.assert_array_equal(np.asarray(hi2)[v], np.asarray(hi1)[v])
    np.testing.assert_array_equal(np.asarray(lo2)[v], np.asarray(lo1)[v])


def test_pallas_pack_known_sequence():
    k = 5
    seq = "ACGTTTGCA" + "N" + "ACGTA"
    codes = enc.seq_to_codes(seq)[None, :]
    lengths = np.array([len(seq)], np.int32)
    hi, lo, v = pack_canonical_pallas(
        jnp.asarray(codes), jnp.asarray(lengths), k, block=8, interpret=True)
    keys, valid = enc.canonical_kmers(enc.seq_to_codes(seq), k)
    np.testing.assert_array_equal(np.asarray(v)[0], valid)
    h_host, l_host = enc.split_key(keys, k)
    np.testing.assert_array_equal(np.asarray(hi)[0][valid], h_host[valid])
    np.testing.assert_array_equal(np.asarray(lo)[0][valid], l_host[valid])

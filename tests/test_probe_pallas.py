"""Pallas bucket-match kernel vs the XLA gather+compare lookup.

The kernel must agree lane-for-lane with ops/probe.lookup_ecs_aux on the
same tables — including stash-resident keys, absent keys, and invalid
lanes (SURVEY.md section 4 item 3: Pallas kernels in interpret mode vs the
oracle per block).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.map.driver import DeviceIndex
from seekmer_tpu.ops.kmer_pack import pack_canonical
from seekmer_tpu.ops.probe import lookup_ecs_aux
from seekmer_tpu.ops.probe_pallas import lookup_ecs_aux_pallas
from seekmer_tpu.utils.simulate import (
    random_transcriptome,
    simulate_packed_batches,
)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(77)
    names, seqs = random_transcriptome(
        rng, num_transcripts=60, min_len=120, max_len=500,
        shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)
    di = DeviceIndex.from_host(index)
    return rng, index, di, seqs


def _both(di, hi, lo, valid, m=2):
    ec_x, aux_x = lookup_ecs_aux(hi, lo, valid, di.table, di.main_slots,
                                 di.stash, di.stash_slots, di.bucket)
    ec_p, aux_p = lookup_ecs_aux_pallas(hi, lo, valid, di.table,
                                        di.main_slots, di.stash,
                                        di.stash_slots, di.bucket,
                                        m=m, interpret=True)
    return ec_x, aux_x, ec_p, aux_p


def test_matches_xla_on_reads(world):
    rng, index, di, seqs = world
    B, L = 64, 100
    codes, _ = simulate_packed_batches(rng, seqs, 1, B, read_len=L,
                                       error_rate=0.02)
    hi, lo, valid = pack_canonical(jnp.asarray(codes[0]),
                                   jnp.full(B, L, jnp.int32), di.k)
    ec_x, aux_x, ec_p, aux_p = _both(di, hi, lo, valid)
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    np.testing.assert_array_equal(np.asarray(aux_x), np.asarray(aux_p))
    assert (np.asarray(ec_p) >= 0).any()  # some lanes actually hit


def test_absent_and_invalid_lanes(world):
    rng, index, di, _ = world
    N = 300
    hi = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))
    lo = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
    valid = jnp.asarray(rng.random(N) < 0.7)
    ec_x, aux_x, ec_p, aux_p = _both(di, hi, lo, valid, m=1)
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    np.testing.assert_array_equal(np.asarray(aux_x), np.asarray(aux_p))


def test_stash_resident_keys(world):
    """Keys the builder placed in the stash must be found by the kernel."""
    rng, index, di, _ = world
    stash_rows = np.asarray(index.stash)
    occ = stash_rows[:, 0] != -1
    if not occ.any():
        pytest.skip("this index needed no stash")
    hi = jnp.asarray(stash_rows[occ, 0])
    lo = jnp.asarray(stash_rows[occ, 1])
    valid = jnp.ones(hi.shape[0], bool)
    ec_x, aux_x, ec_p, aux_p = _both(di, hi, lo, valid, m=1)
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    assert (np.asarray(ec_p) == stash_rows[occ, 2]).all()


def test_synthetic_stash_hit():
    """Hand-built tables: a key whose main home bucket is full and that
    lives only in the stash must resolve through the Pallas salt path."""
    import jax.numpy as jnp

    from seekmer_tpu.ops.hash import hash_kmer, hash_kmer_stash
    from seekmer_tpu.ops.probe import device_table_layout

    bucket, nb, nb_s = 4, 8, 4
    main = np.full((nb * bucket, 4), -1, np.int32)
    stash = np.full((nb_s * bucket, 4), -1, np.int32)
    key = (np.int32(12345), np.int32(678))
    hb = int(hash_kmer(np.uint32(key[0]), np.uint32(key[1])) & (nb - 1))
    # fill the key's main home bucket with decoys sharing no key
    for s in range(bucket):
        main[hb * bucket + s] = (1000 + s, 2000 + s, 7 + s, 0)
    sb = int(hash_kmer_stash(np.uint32(key[0]), np.uint32(key[1]))
             & (nb_s - 1))
    stash[sb * bucket + 1] = (key[0], key[1], 42, 3)

    tbl = jnp.asarray(device_table_layout(main, bucket))
    stb = jnp.asarray(device_table_layout(stash, bucket))
    hi = jnp.asarray([key[0], 999999], jnp.int32)
    lo = jnp.asarray([key[1], 999999], jnp.int32)
    valid = jnp.ones(2, bool)
    ec_x, aux_x = lookup_ecs_aux(hi, lo, valid, tbl, nb * bucket, stb,
                                 nb_s * bucket, bucket)
    ec_p, aux_p = lookup_ecs_aux_pallas(hi, lo, valid, tbl, nb * bucket,
                                        stb, nb_s * bucket, bucket,
                                        m=1, interpret=True)
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    np.testing.assert_array_equal(np.asarray(aux_x), np.asarray(aux_p))
    assert int(ec_p[0]) == 42 and int(aux_p[0]) == 3
    assert int(ec_p[1]) == -1


def test_mapper_pallas_backend_matches_xla(world):
    """Full Mapper run with probe_backend=pallas == the xla backend."""
    from seekmer_tpu.config import MapConfig
    from seekmer_tpu.io.fastq import ReadBatch
    from seekmer_tpu.map.driver import Mapper

    rng, index, di, seqs = world
    B, L = 128, 100
    codes, _ = simulate_packed_batches(rng, seqs, 2, B, read_len=L,
                                       error_rate=0.01)
    lengths = np.full(B, L, np.int32)
    w = np.ones(B, np.int32)

    results = {}
    for backend in ("xla", "pallas"):
        cfg = MapConfig(batch_size=B, sig_table_bits=12,
                        probe_backend=backend)
        mapper = Mapper(index, cfg)
        res = mapper.run(ReadBatch(codes[i], lengths, w) for i in range(2))
        results[backend] = {
            tuple(row.tolist()): int(n)
            for row, n in zip(res.sigs, res.sig_counts)
        }
    assert results["pallas"] == results["xla"]


def test_every_indexed_kmer_found(world):
    """Every key of the main table resolves to its stored EC via Pallas."""
    rng, index, di, _ = world
    rows = np.asarray(index.table)
    occ = rows[:, 0] != -1
    sel = np.flatnonzero(occ)[:2048]
    hi = jnp.asarray(rows[sel, 0])
    lo = jnp.asarray(rows[sel, 1])
    valid = jnp.ones(hi.shape[0], bool)
    ec_x, aux_x, ec_p, aux_p = _both(di, hi, lo, valid, m=4)
    np.testing.assert_array_equal(np.asarray(ec_x), np.asarray(ec_p))
    assert (np.asarray(ec_p) == rows[sel, 2]).all()

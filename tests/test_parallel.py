"""Distributed-without-a-pod tests (SURVEY.md section 4 item 4): the
8-fake-device CPU mesh exercises data-parallel mapping, collective EM with
psum, and sharded bootstrap in ordinary pytest."""

import jax
import numpy as np
import pytest

from seekmer_tpu.config import EMConfig, MapConfig, ShardConfig
from seekmer_tpu.em.em import build_ec_table, run_em
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.io.fastq import batch_reads
from seekmer_tpu.map.driver import Mapper, resolve_signatures
from seekmer_tpu.map.signature import SIG_PAD
from seekmer_tpu.parallel.bootstrap_shard import run_bootstrap_sharded
from seekmer_tpu.parallel.collective_em import run_em_collective
from seekmer_tpu.parallel.data_parallel import DataParallelMapper
from seekmer_tpu.parallel.mesh import make_mesh
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_reads
from tests.oracle import oracle

# the on-chip pass (SEEKMER_TEST_TPU=1) runs on ONE real device; every
# test here needs the 8-device fake mesh
pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device fake mesh")


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(321)
    names, seqs = random_transcriptome(
        rng, num_transcripts=50, min_len=200, max_len=1000,
        shared_prefix_frac=0.5,
    )
    index = build_index_from_seqs(names, seqs)
    sim = simulate_reads(rng, seqs, num_reads=1500, read_len=100,
                         error_rate=0.005)
    return index, sim


def test_mesh_shapes():
    mesh = make_mesh(ShardConfig(data_axis=8, index_axis=1))
    assert mesh.shape == {"reads": 8, "index": 1}
    mesh = make_mesh(ShardConfig(data_axis=0, index_axis=2))
    assert mesh.shape == {"reads": 4, "index": 2}
    with pytest.raises(ValueError):
        make_mesh(ShardConfig(data_axis=3, index_axis=1))


def test_data_parallel_matches_single_chip(world):
    """DP mapping over 8 shards must produce the same signature counts as
    the single-chip mapper (and hence the oracle)."""
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    shard_cfg = ShardConfig(data_axis=8)

    dp = DataParallelMapper(index, cfg, shard_cfg)
    reads_b = [r.encode() for r in sim.reads1]
    res_dp = dp.run(batch_reads(reads_b, cfg))

    single = Mapper(index, cfg)
    res_1 = single.run(batch_reads(reads_b, cfg))

    assert res_dp.total_reads == res_1.total_reads
    assert res_dp.mapped == res_1.mapped
    assert res_dp.overflow == 0

    def as_dict(res):
        return {
            tuple(r[r != int(SIG_PAD)].tolist()): int(n)
            for r, n in zip(res.sigs, res.sig_counts)
        }

    assert as_dict(res_dp) == as_dict(res_1)


def test_collective_em_matches_single(world):
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    em_cfg = EMConfig(rel_tol=1e-6)
    mapper = Mapper(index, cfg)
    result = mapper.run(batch_reads([r.encode() for r in sim.reads1], cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)

    alpha_1, it_1 = run_em(ec, index.lengths, em_cfg)
    mesh = make_mesh(ShardConfig(data_axis=8))
    alpha_8, it_8 = run_em_collective(ec, index.lengths, em_cfg, mesh)

    np.testing.assert_allclose(np.asarray(alpha_8), np.asarray(alpha_1),
                               rtol=1e-4, atol=1e-3)
    # iteration counts should agree (same convergence rule, fp noise aside)
    assert abs(int(it_8) - int(it_1)) <= 2


def test_collective_em_chunked_matches_while_loop(world):
    """The chunked host-driven collective EM (the guard against this
    platform's ~90 s single-execution crash, VERDICT round-1 item 5) must
    be state-identical to the device while_loop version: _block_body is
    shared and post-convergence blocks are the identity."""
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    em_cfg = EMConfig(rel_tol=1e-6, max_iters=20000)
    mapper = Mapper(index, cfg)
    result = mapper.run(batch_reads([r.encode() for r in sim.reads1], cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)

    mesh = make_mesh(ShardConfig(data_axis=8))
    alpha_w, it_w = run_em_collective(ec, index.lengths, em_cfg, mesh,
                                      chunked=False)
    alpha_c, it_c = run_em_collective(ec, index.lengths, em_cfg, mesh,
                                      chunked=True)
    assert int(it_c) == int(it_w)
    np.testing.assert_array_equal(np.asarray(alpha_c), np.asarray(alpha_w))


def test_collective_em_squarem(world):
    """SQUAREM on the collective EM (VERDICT round-2 item 4): the psum'd
    iterate is still a fixed-point map with replicated alpha, so the
    accelerated collective run must land on the single-chip SQUAREM
    answer, converge in fewer EM steps than the plain collective run, and
    its chunked variant must be state-identical to its while_loop form."""
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    em_cfg = EMConfig(rel_tol=1e-6, accel="squarem")
    mapper = Mapper(index, cfg)
    result = mapper.run(batch_reads([r.encode() for r in sim.reads1], cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)

    alpha_1, it_1 = run_em(ec, index.lengths, em_cfg)
    mesh = make_mesh(ShardConfig(data_axis=8))
    alpha_8, it_8 = run_em_collective(ec, index.lengths, em_cfg, mesh,
                                      chunked=False)
    np.testing.assert_allclose(np.asarray(alpha_8), np.asarray(alpha_1),
                               rtol=1e-4, atol=1e-3)
    # single-chip and collective SQUAREM follow the same cycle schedule
    # (psum reduction-order fp noise can shift convergence by one block)
    assert abs(int(it_8) - int(it_1)) <= 3 * em_cfg.check_every

    _, it_plain = run_em_collective(
        ec, index.lengths, EMConfig(rel_tol=1e-6), mesh, chunked=False)
    assert int(it_8) < int(it_plain)

    alpha_c, it_c = run_em_collective(ec, index.lengths, em_cfg, mesh,
                                      chunked=True)
    assert int(it_c) == int(it_8)
    np.testing.assert_array_equal(np.asarray(alpha_c), np.asarray(alpha_8))


def test_sharded_bootstrap(world):
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    em_cfg = EMConfig(bootstrap_samples=16, bootstrap_seed=5)
    mapper = Mapper(index, cfg)
    result = mapper.run(batch_reads([r.encode() for r in sim.reads1], cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)

    mesh = make_mesh(ShardConfig(data_axis=8))
    boot = np.asarray(run_bootstrap_sharded(ec, index.lengths, em_cfg, mesh))
    assert boot.shape == (16, index.num_transcripts)
    np.testing.assert_allclose(boot.sum(axis=1), counts.sum(), rtol=1e-3)
    # shards resampled independently
    assert np.std(boot.sum(axis=1) - boot.sum(axis=1).mean()) < 1e-2
    assert np.std(boot, axis=0).max() > 0


def test_sharded_bootstrap_chunked_and_snapshot_resume(world):
    """The chunked sharded bootstrap (required at scale: a GENCODE-size
    convergence budget in ONE execution would hit this platform's ~90 s
    TPU-worker crash) must be state-identical to the single-execution
    form, and its snapshot hook must support exact kill-and-resume —
    round-3 verdict item 4 closed the 'no snapshot wiring' carve-out."""
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    em_cfg = EMConfig(rel_tol=1e-8, check_every=8, max_iters=400,
                      bootstrap_samples=16, bootstrap_seed=5)
    mapper = Mapper(index, cfg)
    result = mapper.run(batch_reads([r.encode() for r in sim.reads1], cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)

    mesh = make_mesh(ShardConfig(data_axis=8))
    base = np.asarray(run_bootstrap_sharded(ec, index.lengths, em_cfg, mesh,
                                            chunked=False))
    chk = np.asarray(run_bootstrap_sharded(ec, index.lengths, em_cfg, mesh,
                                           chunked=True))
    np.testing.assert_array_equal(chk, base)

    class Boom(Exception):
        pass

    saves = []

    def on_sync(a, it):
        saves.append((a.copy(), it))
        raise Boom  # simulated crash right after the first snapshot

    with pytest.raises(Boom):
        run_bootstrap_sharded(ec, index.lengths, em_cfg, mesh,
                              chunked=True, on_sync=on_sync, snapshots=True)
    a0, it0 = saves[-1]
    assert a0.shape == (index.num_transcripts, 16) and it0 > 0

    res = np.asarray(run_bootstrap_sharded(ec, index.lengths, em_cfg, mesh,
                                           alpha_init=a0, it_init=it0))
    np.testing.assert_array_equal(res, base)


def test_dp_fast_mode_matches_single_chip(world):
    """The two-phase fast mode runs inside the DP shard_map (map_step is
    shared), and the merged result must equal the single-chip fast
    mapper's exactly — per-shard fallback while_loops are collective-free
    so divergent trip counts across shards are safe."""
    index, sim = world
    cfg = MapConfig(batch_size=512, sig_table_bits=12, probe_sample=4)
    reads_b = [r.encode() for r in sim.reads1]

    single = Mapper(index, cfg)
    res_1 = single.run(batch_reads(reads_b, cfg))

    mesh = make_mesh(ShardConfig(data_axis=8))
    dp = DataParallelMapper(index, cfg, ShardConfig(data_axis=8), mesh=mesh)
    res_8 = dp.run(batch_reads(reads_b, cfg))

    def as_dict(r):
        return {tuple(row[row != int(SIG_PAD)].tolist()): int(n)
                for row, n in zip(r.sigs, r.sig_counts)}

    assert res_8.total_reads == res_1.total_reads
    assert as_dict(res_8) == as_dict(res_1)

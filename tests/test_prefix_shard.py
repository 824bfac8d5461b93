"""Prefix-sharded index mode (config 4): sharded build round-trip and
all_to_all routed mapping vs the single-chip mapper (SURVEY.md section 4
item 4 — fake-device mesh exercises the routing collectives)."""

import numpy as np
import pytest

from seekmer_tpu.config import MapConfig, ShardConfig
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.index.store import EMPTY
from seekmer_tpu.io.fastq import batch_reads
from seekmer_tpu.map.driver import Mapper
from seekmer_tpu.map.signature import SIG_PAD
from seekmer_tpu.parallel.mesh import make_mesh
from seekmer_tpu.parallel.prefix_shard import (
    PrefixShardedMapper,
    shard_index_by_prefix,
)
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_reads


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(654)
    names, seqs = random_transcriptome(
        rng, num_transcripts=40, min_len=200, max_len=900,
        shared_prefix_frac=0.5,
    )
    index = build_index_from_seqs(names, seqs)
    sim = simulate_reads(rng, seqs, num_reads=1024, read_len=96,
                         error_rate=0.005)
    return index, sim


def test_shard_build_preserves_keys(world):
    index, _ = world
    sdi = shard_index_by_prefix(index, 4)
    G = sdi.bucket
    total = 0
    for d in range(4):  # slab device layout: row = [hi*G|lo*G|ecaux*G|meta*G]
        total += int((np.asarray(sdi.table[d])[:, :G] != EMPTY).sum())
        total += int((np.asarray(sdi.stash[d])[:, :G] != EMPTY).sum())
    assert total == index.num_kmers


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2)])
def test_prefix_sharded_matches_single(world, mesh_shape):
    index, sim = world
    d_ax, i_ax = mesh_shape
    cfg = MapConfig(batch_size=512, sig_table_bits=12)
    shard_cfg = ShardConfig(data_axis=d_ax, index_axis=i_ax,
                            index_mode="prefix")
    mesh = make_mesh(shard_cfg)
    ps = PrefixShardedMapper(index, cfg, shard_cfg, mesh=mesh)
    reads_b = [r.encode() for r in sim.reads1]
    res_ps = ps.run(batch_reads(reads_b, cfg))
    assert ps.routing_overflow == 0

    single = Mapper(index, cfg)
    res_1 = single.run(batch_reads(reads_b, cfg))

    def as_dict(res):
        return {
            tuple(r[r != int(SIG_PAD)].tolist()): int(n)
            for r, n in zip(res.sigs, res.sig_counts)
        }

    assert res_ps.total_reads == res_1.total_reads
    assert as_dict(res_ps) == as_dict(res_1)

"""Pre-packed 2-bit shard cache (io/pack_cache; SURVEY.md 7.5 item 4's
named ingest mitigation, round-5 verdict item 3): cached == fresh counts,
resume cursors over the cache, staleness detection, cursor-kind guards."""

import json
import os

import numpy as np
import pytest

from seekmer_tpu.config import MapConfig, PipelineConfig
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.models.quantifier import Quantifier
from seekmer_tpu.utils.simulate import (random_transcriptome, simulate_reads,
                                        write_fastq)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(42)
    names, seqs = random_transcriptome(rng, num_transcripts=30)
    index = build_index_from_seqs(names, seqs)
    sim = simulate_reads(rng, seqs, num_reads=700, read_len=100,
                         error_rate=0.005, paired=True)
    d = tmp_path_factory.mktemp("pc")
    fq1 = str(d / "r1.fq.gz")
    fq2 = str(d / "r2.fq.gz")
    write_fastq(fq1, sim.reads1)
    write_fastq(fq2, sim.reads2)
    return index, fq1, fq2


def _pipe_cfg():
    return PipelineConfig().replace(
        map=MapConfig(batch_size=128, sig_table_bits=12))


def _result_key(res):
    return (res.total_reads, res.mapped,
            np.round(np.asarray(res.est_counts), 4).tolist())


def test_cache_build_then_hit_identical(world, tmp_path):
    index, fq1, fq2 = world
    cache = str(tmp_path / "cache.smpack")

    fresh = Quantifier(index, _pipe_cfg()).quantify_files([fq1], [fq2])
    built = Quantifier(index, _pipe_cfg()).quantify_files(
        [fq1], [fq2], pack_cache=cache)
    assert os.path.exists(os.path.join(cache, "meta.json"))
    cached = Quantifier(index, _pipe_cfg()).quantify_files(
        [fq1], [fq2], pack_cache=cache)
    assert _result_key(built) == _result_key(fresh)
    assert _result_key(cached) == _result_key(fresh)


def test_cache_single_end(world, tmp_path):
    index, fq1, _ = world
    cache = str(tmp_path / "se.smpack")
    fresh = Quantifier(index, _pipe_cfg()).quantify_files([fq1])
    Quantifier(index, _pipe_cfg()).quantify_files([fq1], pack_cache=cache)
    cached = Quantifier(index, _pipe_cfg()).quantify_files(
        [fq1], pack_cache=cache)
    assert _result_key(cached) == _result_key(fresh)


def test_stale_cache_rebuilt(world, tmp_path):
    index, fq1, fq2 = world
    cache = str(tmp_path / "st.smpack")
    Quantifier(index, _pipe_cfg()).quantify_files(
        [fq1], [fq2], pack_cache=cache)
    meta = json.load(open(os.path.join(cache, "meta.json")))
    # simulate a source-file change
    meta["sources"][0][1] += 1
    json.dump(meta, open(os.path.join(cache, "meta.json"), "w"))
    from seekmer_tpu.io.pack_cache import cache_valid

    assert not cache_valid(cache, _pipe_cfg().map, [fq1], [fq2])
    # a run rebuilds it and still matches
    fresh = Quantifier(index, _pipe_cfg()).quantify_files([fq1], [fq2])
    rebuilt = Quantifier(index, _pipe_cfg()).quantify_files(
        [fq1], [fq2], pack_cache=cache)
    assert cache_valid(cache, _pipe_cfg().map, [fq1], [fq2])
    assert _result_key(rebuilt) == _result_key(fresh)


def test_cached_checkpoint_resume(world, tmp_path):
    """Kill a cached run mid-stream, resume from its checkpoint: exact."""
    from seekmer_tpu.io.pack_cache import PackCacheSource
    from seekmer_tpu.map.driver import Mapper

    index, fq1, fq2 = world
    cache = str(tmp_path / "ck.smpack")
    cfg = _pipe_cfg()
    Quantifier(index, cfg).quantify_files([fq1], [fq2], pack_cache=cache)

    ckpt = str(tmp_path / "run.ckpt.npz")
    full = Mapper(index, cfg.map).run(
        iter(PackCacheSource(cache, cfg.map)))

    m1 = Mapper(index, cfg.map)
    src = PackCacheSource(cache, cfg.map)
    fed = 0
    saved = None
    for b in iter(src):
        m1.feed(b)
        fed += 1
        if fed == 3:
            assert b.cursor is not None and b.cursor["v"] == "pack1"
            m1.save_checkpoint(ckpt, stream_state=b.cursor)
            saved = b.cursor
            break
    assert saved is not None

    m2 = Mapper(index, cfg.map)
    src2 = PackCacheSource(cache, cfg.map)
    state = m2.restore_checkpoint(ckpt)
    src2.restore(state)
    res = m2.run(iter(src2))
    assert res.total_reads == full.total_reads
    assert res.mapped == full.mapped

    def as_dict(r):
        from seekmer_tpu.map.signature import SIG_PAD

        return {tuple(row[row != int(SIG_PAD)].tolist()): int(n)
                for row, n in zip(r.sigs, r.sig_counts)}

    assert as_dict(res) == as_dict(full)


def test_cursor_kind_guards(world, tmp_path):
    from seekmer_tpu.io.fastq import CheckpointableBatchSource
    from seekmer_tpu.io.pack_cache import PackCacheSource

    index, fq1, fq2 = world
    cache = str(tmp_path / "gd.smpack")
    cfg = _pipe_cfg()
    Quantifier(index, cfg).quantify_files([fq1], [fq2], pack_cache=cache)

    pack_cursor = {"v": "pack1", "paired": True, "s1": [3, 0], "s2": None,
                   "pending": {}}
    offset_cursor = {"v": 1, "paired": True, "s1": [0, 100], "s2": [0, 100],
                     "pending": {}}
    with pytest.raises(ValueError, match="pack-cache"):
        CheckpointableBatchSource([fq1], [fq2], cfg.map).restore(pack_cursor)
    with pytest.raises(ValueError, match="file-offset"):
        PackCacheSource(cache, cfg.map).restore(offset_cursor)


def test_pack_cache_rejects_sharded_and_unpacked(world, tmp_path):
    import dataclasses

    index, fq1, fq2 = world
    cfg = _pipe_cfg()
    nope = cfg.replace(map=dataclasses.replace(cfg.map, h2d_pack_2bit=False))
    with pytest.raises(ValueError, match="no-h2d-pack"):
        Quantifier(index, nope).quantify_files(
            [fq1], [fq2], pack_cache=str(tmp_path / "x.smpack"))


def test_cache_with_fast_mode_auto_cap(world, tmp_path):
    """Cached (2-bit packed) batches through the fast mode: the auto
    fallback-cap calibration's classify-stage program must handle
    pad_len batches, and cached fast == fresh fast."""
    import dataclasses

    index, fq1, fq2 = world
    cache = str(tmp_path / "fm.smpack")
    cfg = _pipe_cfg()
    fast = cfg.replace(map=dataclasses.replace(cfg.map, probe_sample=4))
    fresh = Quantifier(index, fast).quantify_files([fq1], [fq2])
    Quantifier(index, fast).quantify_files([fq1], [fq2], pack_cache=cache)
    cached = Quantifier(index, fast).quantify_files(
        [fq1], [fq2], pack_cache=cache)
    assert _result_key(cached) == _result_key(fresh)

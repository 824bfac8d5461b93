"""Checkpoint/resume tests (SURVEY.md 5.3/5.4): interrupting the mapping
stream mid-run and resuming must reproduce the uninterrupted result."""

import numpy as np
import pytest

from seekmer_tpu.config import EMConfig, MapConfig
from seekmer_tpu.em.em import build_ec_table, run_em
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.io.fastq import batch_reads
from seekmer_tpu.map.driver import Mapper
from seekmer_tpu.map.signature import SIG_PAD
from seekmer_tpu.utils.checkpoint import (
    load_em_snapshot,
    save_em_snapshot,
)
from seekmer_tpu.utils.simulate import random_transcriptome, simulate_reads


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(42)
    names, seqs = random_transcriptome(rng, num_transcripts=30,
                                      shared_prefix_frac=0.5)
    index = build_index_from_seqs(names, seqs)
    sim = simulate_reads(rng, seqs, num_reads=600, read_len=100)
    return index, [r.encode() for r in sim.reads1]


def _as_dict(res):
    return {tuple(r[r != int(SIG_PAD)].tolist()): int(n)
            for r, n in zip(res.sigs, res.sig_counts)}


def test_map_checkpoint_resume(tmp_path, world):
    index, reads = world
    cfg = MapConfig(batch_size=128, sig_table_bits=12)
    ckpt = str(tmp_path / "map.ckpt.npz")

    # uninterrupted baseline
    full = Mapper(index, cfg).run(batch_reads(reads, cfg))

    # interrupted: process only the first 2 batches, checkpoint, "crash"
    m1 = Mapper(index, cfg)
    batches = list(batch_reads(reads, cfg))
    for b in batches[:2]:
        m1.feed(b)
    m1.save_checkpoint(ckpt)
    consumed = m1.total_reads

    # resume in a fresh mapper: skip consumed reads, feed the rest
    m2 = Mapper(index, cfg)
    state = m2.restore_checkpoint(ckpt)
    assert state == {"reads_consumed": consumed}
    rest = reads[consumed:]
    res = m2.run(batch_reads(rest, cfg))

    assert res.total_reads == full.total_reads
    assert _as_dict(res) == _as_dict(full)


def test_restore_missing_checkpoint(tmp_path, world):
    index, _ = world
    m = Mapper(index, MapConfig(batch_size=128))
    assert m.restore_checkpoint(str(tmp_path / "nope.npz")) is None


def test_em_snapshot_roundtrip_and_warm_start(tmp_path, world):
    index, reads = world
    cfg = MapConfig(batch_size=128, sig_table_bits=12)
    from seekmer_tpu.map.driver import resolve_signatures

    result = Mapper(index, cfg).run(batch_reads(reads, cfg))
    members, counts, _ = resolve_signatures(result, index)
    ec = build_ec_table(members, counts, index.num_transcripts)
    em_cfg = EMConfig(rel_tol=1e-6)

    alpha, it = run_em(ec, index.lengths, em_cfg)
    p = str(tmp_path / "em.npz")
    save_em_snapshot(p, np.asarray(alpha), int(it))
    alpha2, it2 = load_em_snapshot(p)
    np.testing.assert_array_equal(alpha2, np.asarray(alpha))

    # warm start from the converged alpha: converges immediately
    alpha3, it3 = run_em(ec, index.lengths, em_cfg,
                         alpha_init=np.asarray(alpha))
    # converges at the first block boundary at/after min_iters
    assert int(it3) <= em_cfg.min_iters + em_cfg.check_every
    np.testing.assert_allclose(np.asarray(alpha3), np.asarray(alpha),
                               rtol=1e-5, atol=1e-5)


def test_old_format_checkpoint_rejected(tmp_path):
    import json

    import numpy as np
    import pytest

    from seekmer_tpu.utils import checkpoint as cp

    path = str(tmp_path / "old.ckpt")
    meta = dict(format=1, total_reads=5, stream_state={})
    with open(path, "wb") as fh:
        np.savez_compressed(
            fh,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            key=np.zeros((17, 2), np.int32), count=np.zeros(17, np.int32),
            sig=np.zeros((17, 4), np.int32), overflow=np.zeros((), np.int32))
    with pytest.raises(ValueError, match="format"):
        cp.load_map_checkpoint(path)


def test_write_h5_roundtrip(tmp_path):
    """kallisto-compatible abundance.h5 schema (sleuth-consumable)."""
    h5py = pytest.importorskip("h5py")
    import numpy as np

    from seekmer_tpu.io.writer import write_h5

    T, B = 7, 3
    rng = np.random.default_rng(0)
    names = np.array([f"t{i}" for i in range(T)])
    lengths = rng.integers(200, 900, T).astype(np.int32)
    eff = lengths - 150.0
    est = rng.random(T) * 100
    boot = rng.random((B, T)) * 100
    path = str(tmp_path / "abundance.h5")
    ok = write_h5(path, names, lengths, eff, est, boot_counts=boot,
                  run_info={"total_reads": 1234, "call": "test"})
    assert ok
    with h5py.File(path) as f:
        np.testing.assert_allclose(f["est_counts"][:], est)
        assert [x.decode() for x in f["aux/ids"][:]] == list(names)
        np.testing.assert_array_equal(f["aux/lengths"][:], lengths)
        np.testing.assert_allclose(f["aux/eff_lengths"][:], eff)
        assert int(f["aux/num_bootstrap"][0]) == B
        assert int(f["aux/num_processed"][0]) == 1234
        np.testing.assert_allclose(f["bootstrap/bs1"][:], boot[1])

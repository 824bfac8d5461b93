"""Fusion-candidate calling from discordant pairs (SURVEY.md 2.1 C12)."""

import numpy as np
import pytest

pytest.importorskip("jax")

from seekmer_tpu.config import MapConfig
from seekmer_tpu.fusion import call_fusions
from seekmer_tpu.index.build import build_index_from_seqs
from seekmer_tpu.io.fastq import batch_read_pairs
from seekmer_tpu.map.driver import Mapper
from seekmer_tpu.utils.simulate import random_transcriptome


def _revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(1312)
    names, seqs = random_transcriptome(
        rng, num_transcripts=20, min_len=300, max_len=600,
        shared_prefix_frac=0.0)
    # two isoforms of GENE0 (shared 200bp prefix) to exercise the
    # same-gene-discordant branch
    seqs = list(seqs) + [seqs[0][:200] + seqs[1][200:400]]
    names = list(names) + ["txp_iso"]
    genes = [f"GENE{i}" for i in range(20)] + ["GENE0"]
    index = build_index_from_seqs(names, seqs, genes=genes)
    return rng, index, names, seqs


def _run(index, pairs, min_count=2):
    cfg = MapConfig(batch_size=64, sig_table_bits=12, paired_end=True,
                    fusion_pairs=True, max_ecs_per_read=8)
    mapper = Mapper(index, cfg)
    r1 = [a.encode() for a, _ in pairs]
    r2 = [b.encode() for _, b in pairs]
    result = mapper.run(batch_read_pairs(zip(r1, r2), cfg))
    return call_fusions(result, index, cfg.max_ecs_per_read,
                        min_count=min_count)


def test_concordant_pairs_are_not_fusions(world):
    rng, index, names, seqs = world
    pairs = []
    for t in (2, 3, 4):
        s = seqs[t]
        for i in range(5):
            pairs.append((s[i:i + 100], _revcomp(s[-(100 + i):len(s) - i])))
    report = _run(index, pairs)
    assert report.candidates == []
    assert report.concordant == len(pairs)


def test_fusion_pairs_are_called(world):
    rng, index, names, seqs = world
    a, b = seqs[5], seqs[7]
    fusion_pairs = [
        (a[i:i + 100], _revcomp(b[i:i + 100])) for i in range(6)
    ]
    normal = [(seqs[3][:100], _revcomp(seqs[3][-100:]))] * 4
    report = _run(index, fusion_pairs + normal)
    assert len(report.candidates) == 1
    c = report.candidates[0]
    assert {c.gene1, c.gene2} == {"GENE5", "GENE7"}
    assert c.count == 6
    assert names[5] in c.transcripts1 + c.transcripts2
    assert report.concordant == 4


def test_same_gene_discordance_is_not_a_fusion(world):
    """Mate1 unique to isoform txp_iso's GENE0-specific part, mate2 unique
    to txp0: disjoint transcript sets but the same gene."""
    rng, index, names, seqs = world
    iso = seqs[20]  # txp_iso = seqs[0][:200] + seqs[1][200:400]
    # mate1 spans the prefix/suffix junction of the isoform (unique to it),
    # mate2 from the tail of txp0 (absent from the isoform)
    pairs = [(iso[150:250], _revcomp(seqs[0][-100:]))] * 3
    report = _run(index, pairs)
    assert report.candidates == []
    assert report.same_gene_discordant == 3


def test_cli_fuse(world, tmp_path):
    from seekmer_tpu.cli import main
    from seekmer_tpu.utils.simulate import write_fastq

    rng, index, names, seqs = world
    index.save(str(tmp_path / "idx.npz"))
    a, b = seqs[2], seqs[13]
    r1 = [a[i:i + 100] for i in range(4)] + [seqs[6][:100]] * 3
    r2 = [_revcomp(b[i:i + 100]) for i in range(4)] + [
        _revcomp(seqs[6][-100:])] * 3
    write_fastq(str(tmp_path / "r1.fq.gz"), r1)
    write_fastq(str(tmp_path / "r2.fq.gz"), r2)
    rc = main(["fuse", str(tmp_path / "idx.npz"), str(tmp_path / "out"),
               str(tmp_path / "r1.fq.gz"), "--mates",
               str(tmp_path / "r2.fq.gz"), "--batch-size", "64",
               "--sig-table-bits", "12"])
    assert rc == 0
    lines = (tmp_path / "out" / "fusions.tsv").read_text().splitlines()
    assert lines[0].startswith("gene1\tgene2")
    assert len(lines) == 2
    g1, g2, n = lines[1].split("\t")[:3]
    assert {g1, g2} == {"GENE2", "GENE13"} and int(n) == 4


def test_min_count_filters(world):
    rng, index, names, seqs = world
    a, b = seqs[9], seqs[11]
    pairs = [(a[:100], _revcomp(b[:100]))]  # single supporting pair
    report = _run(index, pairs, min_count=2)
    assert report.candidates == []
    report = _run(index, pairs, min_count=1)
    assert len(report.candidates) == 1


def test_split_reads_are_called(world):
    """A mate that physically SPANS the fusion junction hits ECs of both
    genes with an empty intersection — called as split-read evidence for
    the gene pair instead of landing in 'unresolved'."""
    rng, index, names, seqs = world
    a, b = seqs[5], seqs[7]
    fused = a[:250] + b[250:]
    # junction-spanning mate1 (junction at its center), mate2 from the
    # downstream (GENE7) side of the fusion
    pairs = [
        (fused[250 - 50 - i: 250 + 50 - i],
         _revcomp(fused[250 + 60 + i: 250 + 160 + i]))
        for i in range(4)
    ]
    report = _run(index, pairs, min_count=2)
    assert report.split_reads >= 4, report
    assert len(report.candidates) == 1
    c = report.candidates[0]
    assert {c.gene1, c.gene2} == {"GENE5", "GENE7"}
    assert c.split_reads >= 4
    assert report.unresolved == 0


def test_split_read_inconsistent_partner_is_unresolved(world):
    """A junction mate whose partner maps to a THIRD gene is not fusion
    evidence."""
    rng, index, names, seqs = world
    a, b, other = seqs[5], seqs[7], seqs[9]
    fused = a[:250] + b[250:]
    pairs = [(fused[200:300], _revcomp(other[100:200])) for _ in range(3)]
    report = _run(index, pairs, min_count=1)
    assert report.split_reads == 0
    assert all({c.gene1, c.gene2} != {"GENE5", "GENE7"}
               for c in report.candidates)
    assert report.unresolved == 3

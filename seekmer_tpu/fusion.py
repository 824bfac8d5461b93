"""Fusion-transcript candidate detection from discordant read pairs.

TPU-native analog of the reference's fusion mode (seekmer fusion.py,
SURVEY.md 2.1 C12 — split-read fusion calling; existence tagged [K-low]
there and out of BASELINE benchmark scope, implemented here for component
completeness): a read pair whose mates pseudoalign to DISJOINT transcript
sets cannot come from any annotated transcript and is evidence for a
fusion between the genes the two mates resolve to.

Pipeline: the mapper runs in fusion mode (MapConfig.fusion_pairs — per-mate
EC signatures kept side by side in the device signature table, see
map/driver.map_step), then this module resolves each distinct pair
signature ONCE on the host:

  mate transcript sets  m1 = ∩ ECs(mate1),  m2 = ∩ ECs(mate2)
  m1 ∩ m2 != {}                      -> concordant (normal pair)
  genes(m1) ∩ genes(m2) != {}        -> same-gene discordance (isoforms,
                                        read-throughs) — not a fusion
  |genes(m1)| == |genes(m2)| == 1    -> fusion candidate (geneA, geneB)
  otherwise                          -> ambiguous (multi-gene mates)

Host cost scales with distinct pair signatures, not read count, exactly
like abundance resolution (map/driver.resolve_signatures).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from .index.store import KMerIndex
from .map.driver import MapResult

log = logging.getLogger(__name__)

_PAD = np.int32(0x7FFFFFFF)


@dataclasses.dataclass
class FusionCandidate:
    gene1: str
    gene2: str
    count: int
    transcripts1: List[str]
    transcripts2: List[str]


@dataclasses.dataclass
class FusionReport:
    candidates: List[FusionCandidate]
    pairs_total: int
    concordant: int
    same_gene_discordant: int
    ambiguous: int
    unresolved: int  # a mate's EC intersection was empty


def _intersect_members(index: KMerIndex, ecs: np.ndarray) -> np.ndarray:
    members = index.ec_members(int(ecs[0]))
    for ec in ecs[1:]:
        members = np.intersect1d(members, index.ec_members(int(ec)),
                                 assume_unique=True)
        if members.size == 0:
            break
    return members


def call_fusions(result: MapResult, index: KMerIndex, max_ecs: int,
                 min_count: int = 2) -> FusionReport:
    """Resolve pair signatures (mapper run with fusion_pairs=True) into
    gene-pair fusion candidates."""
    genes = index.genes if index.genes is not None else index.names
    agg: Dict[Tuple[str, str], int] = {}
    txps: Dict[Tuple[str, str], Tuple[set, set]] = {}
    concordant = same_gene = ambiguous = unresolved = 0

    for row, n in zip(result.sigs, result.sig_counts):
        n = int(n)
        e1 = row[:max_ecs]
        e2 = row[max_ecs:]
        e1 = e1[e1 != _PAD]
        e2 = e2[e2 != _PAD]
        if e1.size == 0 or e2.size == 0:
            unresolved += n
            continue
        m1 = _intersect_members(index, e1)
        m2 = _intersect_members(index, e2)
        if m1.size == 0 or m2.size == 0:
            unresolved += n
            continue
        if np.intersect1d(m1, m2, assume_unique=True).size:
            concordant += n
            continue
        g1 = np.unique(genes[m1])
        g2 = np.unique(genes[m2])
        if np.intersect1d(g1, g2).size:
            same_gene += n
            continue
        if g1.size != 1 or g2.size != 1:
            ambiguous += n
            continue
        key = tuple(sorted((str(g1[0]), str(g2[0]))))
        agg[key] = agg.get(key, 0) + n
        t1, t2 = txps.setdefault(key, (set(), set()))
        (t1 if key[0] == str(g1[0]) else t2).update(
            index.names[m1].tolist())
        (t2 if key[0] == str(g1[0]) else t1).update(
            index.names[m2].tolist())

    candidates = [
        FusionCandidate(gene1=k[0], gene2=k[1], count=c,
                        transcripts1=sorted(txps[k][0]),
                        transcripts2=sorted(txps[k][1]))
        for k, c in agg.items() if c >= min_count
    ]
    candidates.sort(key=lambda c: (-c.count, c.gene1, c.gene2))
    dropped = sum(c for c in agg.values() if c < min_count)
    report = FusionReport(
        candidates=candidates,
        pairs_total=result.total_reads,
        concordant=concordant,
        same_gene_discordant=same_gene,
        ambiguous=ambiguous + dropped,
        unresolved=unresolved + (result.total_reads - result.mapped
                                 - result.overflow),
    )
    log.info(
        "fusion calling: %d candidates (>=%d pairs) from %d pairs "
        "(%d concordant, %d same-gene, %d ambiguous, %d unresolved)",
        len(candidates), min_count, report.pairs_total, report.concordant,
        report.same_gene_discordant, report.ambiguous, report.unresolved)
    return report


def detect_fusions_files(index: KMerIndex, fastq_paths: List[str],
                         mate_paths: List[str], cfg=None,
                         min_count: int = 2) -> FusionReport:
    """End-to-end fusion detection over paired FASTQ files."""
    from .config import MapConfig
    from .io.fastq import batch_read_pairs_native
    from .map.driver import Mapper
    from .utils.prefetch import device_put_batches, prefetch

    if cfg is None:
        cfg = MapConfig()
    cfg = dataclasses.replace(cfg, paired_end=True, fusion_pairs=True)
    mapper = Mapper(index, cfg)
    batches = prefetch(device_put_batches(
        batch_read_pairs_native(fastq_paths, mate_paths, cfg)), depth=4)
    result = mapper.run(batches)
    return call_fusions(result, index, cfg.max_ecs_per_read,
                        min_count=min_count)

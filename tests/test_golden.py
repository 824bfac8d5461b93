"""Reference-golden parity (SURVEY.md section 4 item 1): auto-skips until
tests/golden/ holds real reference Seekmer outputs (the mount
/root/reference/ was empty at survey time; see tests/golden/README.md for
the drop-in format). The float64 oracle (tests/oracle/) is the provisional
stand-in exercised by the rest of the suite."""

import glob
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _golden_available() -> bool:
    return os.path.exists(os.path.join(GOLDEN, "abundance.tsv"))


@pytest.mark.skipif(not _golden_available(),
                    reason="no reference goldens present "
                           "(tests/golden/README.md)")
def test_reference_golden_parity(tmp_path):
    import csv

    from seekmer_tpu.config import (EMConfig, IndexConfig, MapConfig,
                                    PipelineConfig)
    from seekmer_tpu.index.build import build_index
    from seekmer_tpu.models.quantifier import Quantifier

    params = {}
    pj = os.path.join(GOLDEN, "params.json")
    if os.path.exists(pj):
        params = json.load(open(pj))

    fasta = glob.glob(os.path.join(GOLDEN, "inputs", "transcripts.fa*"))[0]
    gtf = glob.glob(os.path.join(GOLDEN, "inputs", "genes.gtf*"))
    r1 = sorted(glob.glob(os.path.join(GOLDEN, "inputs", "reads_1.fq*")))
    r2 = sorted(glob.glob(os.path.join(GOLDEN, "inputs", "reads_2.fq*")))

    index = build_index(fasta, gtf_path=gtf[0] if gtf else None,
                        cfg=IndexConfig())
    cfg = PipelineConfig().replace(
        map=MapConfig(paired_end=bool(r2)),
        em=EMConfig(
            mean_fragment_length=params.get("fragment_length", 200.0),
            fragment_length_sd=params.get("fragment_sd", 0.0),
            estimate_fld=False,  # pin the reference's FLD parameters
            rel_tol=params.get("em_tolerance", 1e-4),
            max_iters=params.get("em_max_iters", 1000),
            use_x64=True,
        ))
    q = Quantifier(index, cfg)
    res = q.quantify_files(r1, mate_paths=r2 or None)

    ref = {}
    with open(os.path.join(GOLDEN, "abundance.tsv")) as fh:
        for row in csv.DictReader(fh, delimiter="\t"):
            ref[row["target_id"]] = (float(row["est_counts"]),
                                     float(row["tpm"]))
    assert set(ref) == set(res.names.tolist())
    got_counts = dict(zip(res.names.tolist(), res.est_counts))
    got_tpm = dict(zip(res.names.tolist(), res.tpm))
    for t, (rc, rt) in ref.items():
        np.testing.assert_allclose(got_counts[t], rc, rtol=1e-3, atol=0.5)
        np.testing.assert_allclose(got_tpm[t], rt, rtol=1e-3, atol=0.5)

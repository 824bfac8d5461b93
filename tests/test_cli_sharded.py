"""CLI-level sharded runs on the fake-device mesh: --data-shards (config 3)
and --index-shards (config 4) must reproduce the single-chip output."""

import json
import subprocess
import sys

import numpy as np
import pytest

from seekmer_tpu.io.writer import read_abundance
from seekmer_tpu.utils.simulate import (
    random_transcriptome, simulate_reads, write_fasta, write_fastq,
)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(88)
    names, seqs = random_transcriptome(rng, num_transcripts=40,
                                      shared_prefix_frac=0.5)
    sim = simulate_reads(rng, seqs, num_reads=1024, read_len=100)
    fa, fq = str(d / "ref.fa"), str(d / "r.fq.gz")
    write_fasta(fa, names, seqs)
    write_fastq(fq, sim.reads1)
    return d, fa, fq


def _run(args, env_extra=None):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, "-m", "seekmer_tpu"] + args,
                       capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    return r


@pytest.mark.slow
def test_sharded_cli_matches_single(files):
    d, fa, fq = files
    idx = str(d / "index.npz")
    _run(["index", fa, idx])
    _run(["infer", idx, str(d / "q1"), fq, "--batch-size", "256"])
    _run(["infer", idx, str(d / "q3"), fq, "--batch-size", "256",
          "--data-shards", "8"])
    _run(["infer", idx, str(d / "q4"), fq, "--batch-size", "256",
          "--data-shards", "2", "--index-shards", "4"])

    base = read_abundance(str(d / "q1/abundance.tsv"))
    for out in ("q3", "q4"):
        tab = read_abundance(str(d / out / "abundance.tsv"))
        np.testing.assert_allclose(tab["est_counts"], base["est_counts"],
                                   rtol=1e-3, atol=1e-2)
        info = json.load(open(str(d / out / "run_info.json")))
        base_info = json.load(open(str(d / "q1/run_info.json")))
        assert info["mapped"] == base_info["mapped"]

"""Two-process multi-host smoke in CI (SURVEY.md section 4 item 4,
VERDICT round-1 item 8): benchmarks/multihost_smoke.py launches two
localhost jax.distributed processes and asserts (a) the collective psum EM
matches the single-process EM and (b) data-parallel MAPPING across
processes merges to the single-chip result. Run here so a regression in
the cross-process paths fails the suite, not just a manual smoke."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.slow
def test_two_process_smoke():
    env = dict(os.environ)
    # the smoke manages its own backend configuration per worker
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=280,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke: PASS" in proc.stdout

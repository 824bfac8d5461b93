"""Pallas EM fixed-point kernel vs the CSR path and the float64 oracle
(SURVEY.md section 4 item 3: kernels in interpret mode vs numpy oracle)."""

import numpy as np
import pytest

from seekmer_tpu.config import EMConfig
from seekmer_tpu.em import bootstrap as bs
from seekmer_tpu.em.em import build_ec_table, run_em
from seekmer_tpu.ops.em_pallas import fits_pallas
from tests.oracle import oracle


@pytest.fixture
def system(rng):
    T, E = 60, 150
    lengths = rng.integers(250, 3000, size=T).astype(np.int32)
    members = [
        np.sort(rng.choice(T, size=int(rng.integers(1, 6)),
                           replace=False)).astype(np.int32)
        for _ in range(E)
    ]
    counts = rng.integers(1, 500, size=E).astype(np.float64)
    return T, lengths, members, counts


def test_fits_pallas_bounds():
    assert fits_pallas(1000, 1000)
    assert not fits_pallas(500_000, 200_000)


def test_pallas_em_matches_csr_and_oracle(system):
    T, lengths, members, counts = system
    cfg_p = EMConfig(rel_tol=1e-6, max_iters=2000, backend="pallas")
    cfg_c = EMConfig(rel_tol=1e-6, max_iters=2000, backend="csr")
    ec = build_ec_table(members, counts, T)

    alpha_p, it_p = run_em(ec, lengths, cfg_p)
    alpha_c, it_c = run_em(ec, lengths, cfg_c)
    o_alpha, _ = oracle.run_em(members, counts, lengths, cfg_c)

    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_c),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(alpha_p), o_alpha,
                               rtol=5e-3, atol=1e-2)
    assert abs(int(it_p) - int(it_c)) <= 20  # f32 convergence noise differs per backend


def test_pallas_em_warm_start(system):
    T, lengths, members, counts = system
    cfg = EMConfig(rel_tol=1e-6, backend="pallas")
    ec = build_ec_table(members, counts, T)
    alpha, _ = run_em(ec, lengths, cfg)
    alpha2, it2 = run_em(ec, lengths, cfg, alpha_init=np.asarray(alpha))
    # converges at the first block boundary at/after min_iters
    assert int(it2) <= cfg.min_iters + cfg.check_every


def test_pallas_bootstrap_matches_shapes(system):
    T, lengths, members, counts = system
    cfg = EMConfig(bootstrap_samples=8, bootstrap_seed=3, backend="pallas")
    ec = build_ec_table(members, counts, T)
    boot = np.asarray(bs.run_bootstrap(ec, lengths, cfg))
    assert boot.shape == (8, T)
    np.testing.assert_allclose(boot.sum(axis=1), counts.sum(), rtol=1e-3)
    # Same seed, CSR backend, same (shared) resamples. Transcripts with
    # IDENTICAL EC membership are EM-degenerate (any mass split among them
    # is a fixed point; backend reduction order picks one), so compare the
    # mass of each degeneracy group, not per-transcript values.
    cfg_c = EMConfig(bootstrap_samples=8, bootstrap_seed=3, backend="csr")
    boot_c = np.asarray(bs.run_bootstrap(ec, lengths, cfg_c))

    sig_of_t = [tuple() for _ in range(T)]
    for e, mem in enumerate(members):
        for t in mem:
            sig_of_t[t] = sig_of_t[t] + (e,)
    groups = {}
    for t, sig in enumerate(sig_of_t):
        groups.setdefault(sig, []).append(t)
    gsum = np.stack([boot[:, ts].sum(axis=1) for ts in groups.values()], 1)
    gsum_c = np.stack([boot_c[:, ts].sum(axis=1) for ts in groups.values()], 1)
    np.testing.assert_allclose(gsum, gsum_c, rtol=5e-3, atol=5e-2)

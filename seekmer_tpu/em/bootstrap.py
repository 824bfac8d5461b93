"""Bootstrap uncertainty quantification: multinomially resampled EC counts,
EM re-run per replicate (reference: infer.py's bootstrap loop, SURVEY.md 2.1
C8 / call stack 3.5).

TPU-first: the reference loops replicates serially; here all B replicates
run as ONE batched while_loop (`vmap` of the EM step over the replicate
axis, SURVEY.md 2.2 P4) and the replicate axis can additionally be sharded
across chips (parallel/ wiring). The fixed point iterates until every
replicate meets the shared convergence rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import EMConfig
from .em import ECTable, effective_lengths, em_step, run_blocked_fixed_point


def resample_counts(key, counts, num_samples: int):
    """Multinomial resample of the EC count vector: n^(b) ~ Mult(N, n/N).

    jax.random.multinomial lowers to a sequential binomial scan over the E
    categories; unroll amortizes its per-step overhead (it dominated the
    bootstrap wall clock at E ~ 1400)."""
    N = counts.sum()
    p = counts / N
    keys = jax.random.split(key, num_samples)
    draw = lambda k: jax.random.multinomial(k, N, p, unroll=16)
    return jax.vmap(draw)(keys).astype(counts.dtype)


def bootstrap_core(counts, ec_ids, txp_ids, lengths, key, n_replicates: int,
                   num_ecs: int, num_transcripts: int, cfg: EMConfig):
    """Resample + batched EM for ``n_replicates`` replicates (shared by the
    single-chip jit below and the sharded wrapper in parallel/)."""
    cmat = resample_counts(key, counts, n_replicates)  # [B, E]
    return batched_em(cmat, counts.dtype, ec_ids, txp_ids, lengths,
                      num_ecs, num_transcripts, cfg)


def batched_em(cmat, dtype, ec_ids, txp_ids, lengths,
               num_ecs: int, num_transcripts: int, cfg: EMConfig):
    """Batched CSR EM over pre-resampled count rows [B, E].

    The replicate axis is FLATTENED into the segment ids (replicate b's
    entries use EC ids b*E+e and transcript ids b*T+t) rather than vmapped:
    vmapped segment_sum miscompiled on the TPU backend (alpha collapsed to
    zero and "converged" vacuously — caught by the oracle-judged TPU diag);
    flat segment sums are the same primitive the single-run EM uses.
    """
    eff = effective_lengths(lengths, cfg, dtype)
    B, T = cmat.shape[0], num_transcripts
    nnz = ec_ids.shape[0]
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    ec_b = (ec_ids[None, :] + boff * num_ecs).reshape(-1)
    txp_b = (txp_ids[None, :] + boff * T).reshape(-1)
    counts_flat = cmat.reshape(-1).astype(dtype)
    eff_b = jnp.tile(eff, B)
    ec_flat = ECTable(counts_flat, ec_b, txp_b, B * num_ecs, B * T)

    n_per = cmat.sum(axis=1, keepdims=True)
    alpha0 = jnp.broadcast_to(n_per / T, (B, T)).astype(dtype).reshape(-1)

    it, _, alpha = run_blocked_fixed_point(
        lambda a: em_step(a, ec_flat, eff_b), alpha0, cfg)
    return alpha.reshape(B, T), it


@functools.partial(
    jax.jit, static_argnames=("num_ecs", "num_transcripts", "cfg")
)
def _bootstrap_jit(counts, ec_ids, txp_ids, lengths, num_ecs,
                   num_transcripts, cfg: EMConfig):
    key = jax.random.PRNGKey(cfg.bootstrap_seed)
    return bootstrap_core(counts, ec_ids, txp_ids, lengths, key,
                          cfg.bootstrap_samples, num_ecs, num_transcripts,
                          cfg)


def run_bootstrap(ec: ECTable, lengths, cfg: EMConfig):
    """Returns est_counts per replicate: float[B, T].

    Uses the fused Pallas fixed-point kernel when the dense membership and
    replicate batch fit VMEM (the replicate axis turns the EM contractions
    into genuine MXU matmuls); falls back to the vmapped CSR loop.
    """
    from .em import _pallas_interpret, _use_pallas, dense_membership

    B, T = cfg.bootstrap_samples, ec.num_transcripts
    # ONE shared jitted resample regardless of EM backend, so backends are
    # numerically comparable (and the sequential multinomial scan compiles
    # once).
    counts = ec.counts.astype(jnp.float32)
    key = jax.random.PRNGKey(cfg.bootstrap_seed)
    cmat = _resample_jit(key, counts, B)  # [B, E]
    if _use_pallas(ec, cfg, replicates=B):
        from ..ops.em_pallas import em_fixed_point

        eff = effective_lengths(jnp.asarray(lengths), cfg, jnp.float32)
        inv_eff = (1.0 / eff)[None, :]
        alpha0 = jnp.broadcast_to(
            cmat.sum(axis=1, keepdims=True) / T, (B, T)).astype(jnp.float32)
        alpha, _ = em_fixed_point(
            dense_membership(ec), cmat, inv_eff, alpha0, cfg, T,
            interpret=_pallas_interpret(),
        )
        return alpha
    alpha, _ = _batched_em_jit(
        cmat, ec.ec_ids, ec.txp_ids, jnp.asarray(lengths),
        ec.num_ecs, ec.num_transcripts, cfg,
    )
    return alpha


@functools.partial(jax.jit, static_argnames=("n",))
def _resample_jit(key, counts, n: int):
    return resample_counts(key, counts, n)


@functools.partial(
    jax.jit, static_argnames=("num_ecs", "num_transcripts", "cfg")
)
def _batched_em_jit(cmat, ec_ids, txp_ids, lengths, num_ecs,
                    num_transcripts, cfg: EMConfig):
    return batched_em(cmat, cmat.dtype, ec_ids, txp_ids, lengths,
                      num_ecs, num_transcripts, cfg)

"""Pallas TPU kernel: the ENTIRE EM fixed point in one kernel launch.

The EM E/M steps (reference: seekmer infer.py's numpy loop, SURVEY.md 3.4)
are, in matrix form over the dense EC-membership matrix M in {0,1}^{E x T}:

    x      = alpha / eff                      (elementwise, VPU)
    denom  = x @ M^T                          (MXU)
    r      = n / denom                        (VPU)
    alpha' = x * (r @ M)                      (MXU)

so one iteration is two MXU contractions + elementwise work. When M fits
in VMEM (config-1-scale transcriptomes and all bootstrap work), this
kernel keeps alpha, M, n and eff resident in VMEM and runs the whole
``while`` fixed point inside one pallas_call — no per-iteration dispatch,
no HBM traffic after the initial fill. The replicate axis R batches
bootstrap resamples into genuine matmuls [BASELINE.json:11].

em/em.py picks backends (auto: single-run EM uses the flat-CSR
while_loop, which measures far faster for R=1; this kernel wins for
BATCHED bootstrap replicates, where the replicate axis turns the
contractions into real MXU matmuls — see _use_pallas and
docs/PERFORMANCE.md).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EMConfig


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _em_kernel(n_ref, M_ref, inv_eff_ref, alpha0_ref, alpha_out_ref,
               iters_ref, *, cfg: EMConfig, n_active_txp: int):
    """alpha0/alpha_out: (R, T); M: (E, T); n: (R, E); inv_eff: (1, T)."""
    inv_eff = inv_eff_ref[:]
    M = M_ref[:]
    n = n_ref[:]

    # mask padding transcripts out of the convergence test
    T = alpha0_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    real_txp = col < n_active_txp

    def one_iter(alpha):
        x = alpha * inv_eff
        denom = jax.lax.dot_general(
            x, M, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (R, E)
        r = jnp.where(denom > 0, n / jnp.where(denom > 0, denom, 1.0), 0.0)
        back = jax.lax.dot_general(
            r, M, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (R, T)
        return x * back

    # blocked schedule identical to em.run_blocked_fixed_point (and the
    # numpy oracle): check_every-1 raw steps + one monitored step per
    # while round, so iteration counts agree across all backends
    C = max(cfg.check_every, 1)

    def cond(state):
        it, converged, _ = state
        return (~converged) & (it < cfg.max_iters)

    def body(state):
        it, _, alpha = state
        alpha_m = jax.lax.fori_loop(0, C - 1, lambda i, a: one_iter(a),
                                    alpha)
        alpha_new = one_iter(alpha_m)
        active = (alpha_new > cfg.count_floor) & real_txp
        rel = jnp.abs(alpha_new - alpha_m) / (alpha_new + cfg.abs_floor)
        converged = (active.any()
                     & (jnp.max(jnp.where(active, rel, 0.0)) < cfg.rel_tol)
                     & (it + C >= cfg.min_iters))
        return it + C, converged, alpha_new

    it, _, alpha = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), alpha0_ref[:])
    )
    alpha_out_ref[:] = alpha
    iters_ref[0, 0] = it


def _em_kernel_r1(n_ref, M_ref, inv_eff_ref, alpha0_ref, alpha_out_ref,
                  iters_ref, *, cfg: EMConfig, n_active_txp: int):
    """Single-replicate EM with VPU broadcast-reductions instead of MXU.

    With R=1 the contractions are vector-matrix products: the MXU form
    streams the whole E x T membership matrix through the systolic array
    per pass (x6 at Precision.HIGHEST) to use 1 of every 8 result rows,
    so iteration time is weight-load bound. Broadcast-multiply + reduce
    on the VPU traverses M once per half-step at full width AND stays
    exact f32. Layout: n (E, 1); alpha/inv_eff (1, T); M (E, T).
    """
    inv_eff = inv_eff_ref[:]
    M = M_ref[:]
    n = n_ref[:]

    T = alpha0_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    real_txp = col < n_active_txp

    def one_iter(alpha):
        x = alpha * inv_eff                                   # (1, T)
        denom = jnp.sum(M * x, axis=1, keepdims=True)         # (E, 1)
        r = jnp.where(denom > 0, n / jnp.where(denom > 0, denom, 1.0), 0.0)
        back = jnp.sum(M * r, axis=0, keepdims=True)          # (1, T)
        return x * back

    # blocked schedule identical to em.run_blocked_fixed_point (and the
    # numpy oracle): check_every-1 raw steps + one monitored step per
    # while round, so iteration counts agree across all backends
    C = max(cfg.check_every, 1)

    def cond(state):
        it, converged, _ = state
        return (~converged) & (it < cfg.max_iters)

    def body(state):
        it, _, alpha = state
        alpha_m = jax.lax.fori_loop(0, C - 1, lambda i, a: one_iter(a),
                                    alpha)
        alpha_new = one_iter(alpha_m)
        active = (alpha_new > cfg.count_floor) & real_txp
        rel = jnp.abs(alpha_new - alpha_m) / (alpha_new + cfg.abs_floor)
        converged = (active.any()
                     & (jnp.max(jnp.where(active, rel, 0.0)) < cfg.rel_tol)
                     & (it + C >= cfg.min_iters))
        return it + C, converged, alpha_new

    it, _, alpha = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False), alpha0_ref[:])
    )
    alpha_out_ref[:] = alpha
    iters_ref[0, 0] = it


# M bigger than this stays on the CSR path (VMEM is ~16MB/core; leave room
# for alpha/denom/n and double buffering).
VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def fits_pallas(num_ecs: int, num_transcripts: int, replicates: int = 1) -> bool:
    E = _round_up(max(num_ecs, 1), 128)
    T = _round_up(max(num_transcripts, 1), 128)
    R = _round_up(max(replicates, 1), 8)
    need = 4 * (E * T + R * E * 2 + R * T * 2)
    return need <= VMEM_BUDGET_BYTES


@functools.partial(jax.jit, static_argnames=("cfg", "n_active_txp", "interpret"))
def em_fixed_point(
    M: jnp.ndarray,      # float32[E, T] dense membership (padded ok)
    n: jnp.ndarray,      # float32[R, E] counts per replicate
    inv_eff: jnp.ndarray,  # float32[1, T] 1/eff_length (0 for padding)
    alpha0: jnp.ndarray,   # float32[R, T]
    cfg: EMConfig,
    n_active_txp: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run EM to convergence fully on-chip. Returns (alpha [R, T], iters)."""
    E, T = M.shape
    R = n.shape[0]
    Ep, Tp = _round_up(E, 8 if R == 1 else 128), _round_up(T, 128)
    Rp = 1 if R == 1 else _round_up(R, 8)
    M = jnp.pad(M, ((0, Ep - E), (0, Tp - T)))
    inv_eff = jnp.pad(inv_eff, ((0, 0), (0, Tp - T)))
    alpha0 = jnp.pad(alpha0, ((0, Rp - R), (0, Tp - T)))
    if R == 1:
        # VPU single-replicate kernel: counts as an (E, 1) column
        kernel = _em_kernel_r1
        n = jnp.pad(n, ((0, 0), (0, Ep - E))).reshape(Ep, 1)
    else:
        kernel = _em_kernel
        n = jnp.pad(n, ((0, Rp - R), (0, Ep - E)))

    alpha, iters = pl.pallas_call(
        functools.partial(kernel, cfg=cfg, n_active_txp=n_active_txp),
        out_shape=(
            jax.ShapeDtypeStruct((Rp, Tp), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        # Precision.HIGHEST multiplies VMEM scratch ~3x; raise the scoped
        # limit above the 16MB default (v5e has headroom).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(n, M, inv_eff, alpha0)
    return alpha[:R, :T], iters[0, 0]

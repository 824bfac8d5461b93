"""P4 — bootstrap replicates sharded across chips (SURVEY.md 2.2): config 5
runs 100 EM bootstrap replicates as a vmapped batch [BASELINE.json:11]; here
the replicate axis is split over the mesh's data axis, each chip resampling
with an axis-folded PRNG key and running its replicates' batched EM locally
(no per-iteration collectives — replicates are independent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EMConfig, ShardConfig
from ..em.bootstrap import bootstrap_core
from ..em.em import ECTable


def run_bootstrap_sharded(
    ec: ECTable,
    lengths,
    cfg: EMConfig,
    mesh: Mesh,
    shard_cfg: ShardConfig = ShardConfig(),
):
    """Returns est_counts float[B, T], replicate axis sharded over the mesh.

    Replicate b on shard d uses key fold_in(fold_in(seed_key, d), local_b),
    so results are reproducible for a fixed mesh size.
    """
    axis = shard_cfg.data_axis_name
    D = mesh.shape[axis]
    B = cfg.bootstrap_samples
    if B % D:
        raise ValueError(f"bootstrap_samples {B} not divisible by {D} shards")
    B_local = B // D

    def local(counts, ec_ids, txp_ids, lengths):
        d = jax.lax.axis_index(axis)
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.bootstrap_seed), d)
        alpha, _ = bootstrap_core(
            counts, ec_ids, txp_ids, lengths, key, B_local,
            ec.num_ecs, ec.num_transcripts, cfg,
        )
        return alpha  # [B_local, T]

    sm = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sm)(ec.counts, ec.ec_ids, ec.txp_ids, jnp.asarray(lengths))

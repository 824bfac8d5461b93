"""Multi-process (multi-host) checkpoint/resume for the sharded mappers
(SURVEY.md 5.3 — no mode carve-outs: batch-granular restart must also
cover BASELINE configs 3/4 when the mesh spans processes).

Layout: ONE global table file (the allgathered SigTable, written by
process 0 — every host computes the same global array, so one copy
suffices) plus a per-host cursor sidecar (`<path>.host<i>.npz`) holding
that host's read-stream position and read counter. Every artifact is
stamped with a monotonically increasing save ``step``; restore refuses a
step mismatch (the signature of a crash BETWEEN the table write and the
sidecar writes, or of a resume under a different process count), because
resuming a table from save N with a cursor from save M double- or
drop-counts the reads in between.

Write order: table first (process 0), barrier, then every host's sidecar,
barrier. A crash before the table rename leaves the previous save fully
consistent; a crash after it is detected via the step stamp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def save_sharded_checkpoint(path: str, table, total_reads: int,
                            stream_state: Optional[dict], allgather,
                            step: int) -> None:
    """Collective: every process must call this at the same point.

    ``allgather`` pulls one mesh-sharded array to a full host copy
    (the mapper's ``_host``; a cross-process allgather, so all processes
    participate even though only process 0 writes the table file)."""
    import jax
    from jax.experimental import multihost_utils

    from ..map.signature import SigTable
    from ..utils.checkpoint import save_host_cursor, save_map_checkpoint

    host = SigTable(*(allgather(x) for x in table))
    if jax.process_index() == 0:
        # total_reads in the table file is per-host and meaningless for
        # multi-process saves; the authoritative counters live in the
        # sidecars. -1 marks it unused.
        save_map_checkpoint(path, host, -1, None, step=step)
    multihost_utils.sync_global_devices(f"seekmer_ckpt_table_{step}")
    save_host_cursor(path, jax.process_index(), stream_state, total_reads,
                     step)
    multihost_utils.sync_global_devices(f"seekmer_ckpt_done_{step}")


def restore_sharded_checkpoint(
    path: str,
) -> Optional[Tuple[object, int, Optional[dict], int]]:
    """Returns (host SigTable, per-host total_reads, per-host cursor,
    step), or None when no checkpoint exists. Raises on a step mismatch
    between the global table and this host's sidecar."""
    import jax

    from ..utils.checkpoint import load_host_cursor, load_map_checkpoint

    loaded = load_map_checkpoint(path, with_step=True)
    if loaded is None:
        return None
    table, _unused, _nocursor, step = loaded
    hc = load_host_cursor(path, jax.process_index())
    if hc is None or hc[2] != step:
        raise ValueError(
            f"multi-process checkpoint {path} is inconsistent on host "
            f"{jax.process_index()}: sidecar "
            f"{'missing' if hc is None else f'step {hc[2]}'} vs table step "
            f"{step} (crash during save, or different process count); "
            "delete the checkpoint files to start fresh")
    cursor, total_reads, _ = hc
    return table, total_reads, cursor, step


def place_global(arr: np.ndarray, sharding):
    """Place a host-replicated array under a (possibly multi-process)
    NamedSharding: each process materializes only its addressable shards
    by slicing its full host copy."""
    import jax

    if jax.process_count() > 1:
        arr = np.asarray(arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(arr, sharding)


def allgather_host(x) -> np.ndarray:
    """Pull a mesh-sharded array to a full host copy; multi-process,
    shards are allgathered so every host sees the global array."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save_mapper_checkpoint(mapper, path: str,
                           stream_state: Optional[dict]) -> None:
    """Shared checkpoint save for the sharded mappers (DP and prefix —
    they differ only in the table's sharding, which save does not need).
    Single-process: plain host pull + one file. Multi-process: the
    collective global-table + per-host-sidecar protocol above."""
    import jax

    from ..map.signature import SigTable

    if jax.process_count() > 1:
        mapper._ckpt_step += 1
        save_sharded_checkpoint(path, mapper.table, mapper.total_reads,
                                stream_state, mapper._host,
                                mapper._ckpt_step)
        return
    from ..utils.checkpoint import save_map_checkpoint

    host = SigTable(*(np.asarray(x) for x in mapper.table))
    save_map_checkpoint(path, host, mapper.total_reads, stream_state)


def restore_mapper_checkpoint(mapper, path: str, sharding):
    """Shared checkpoint restore: re-places the table under ``sharding``
    (the mapper's own spec — reads-axis for DP, both-axes for prefix).
    Returns the stream cursor ({} when none), or None if absent."""
    import jax

    from ..map.signature import SigTable

    if jax.process_count() > 1:
        loaded = restore_sharded_checkpoint(path)
        if loaded is None:
            return None
        table, total_reads, stream_state, step = loaded
        mapper._ckpt_step = step
        put = lambda x: place_global(np.asarray(x), sharding)
    else:
        from ..utils.checkpoint import load_map_checkpoint

        loaded = load_map_checkpoint(path)
        if loaded is None:
            return None
        table, total_reads, stream_state = loaded
        if total_reads < 0:
            # the -1 sentinel save_sharded_checkpoint writes into the table
            # file: the authoritative per-host counters live in the
            # sidecars, which a single-process restore cannot consume —
            # restoring would leave total_reads negative and unmapped
            # counts nonsensical (round-3 advisor finding)
            raise ValueError(
                f"checkpoint {path} was written by a multi-process run; "
                "restore it under the same process count (or delete the "
                "checkpoint files to start fresh)")
        put = lambda x: jax.device_put(np.asarray(x), sharding)
    if np.asarray(table.count).shape != mapper.table.count.shape:
        raise ValueError(
            "checkpoint table shape does not match this mapper's mesh/"
            "sig_table_bits configuration")
    from ..utils.checkpoint import adapt_ec_count

    table = adapt_ec_count(table, mapper.table.ec_count.shape)
    mapper.table = SigTable(*(put(x) for x in table))
    mapper.total_reads = total_reads
    return stream_state if stream_state is not None else {}

"""Batch-granular checkpoint/resume (SURVEY.md 5.3/5.4).

The reference's only checkpoint is the index file itself (build once, reuse;
a crashed run is simply re-run). For long TPU mapping runs we add:

  * mapping checkpoints: the device signature table + read-stream cursor
    (file index / reads consumed) written every N batches; resume skips
    already-counted reads and restores the table;
  * EM snapshots: the alpha vector + iteration counter (EM is cheap, but
    the snapshot makes the pipeline restartable at every stage boundary).

Plain npz — same serialization family as the index store.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

# 2: SigTable.key became bucketized (S/KB+1, KB, 2); format-1 checkpoints
# would otherwise load "successfully" and crash accumulate at trace time.
FORMAT = 2


def save_map_checkpoint(
    path: str,
    table,
    total_reads: int,
    stream_state: dict,
) -> None:
    """Write the signature-table state + stream cursor atomically."""
    meta = dict(format=FORMAT, total_reads=int(total_reads),
                stream_state=stream_state)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            key=np.asarray(table.key),
            count=np.asarray(table.count),
            sig=np.asarray(table.sig),
            overflow=np.asarray(table.overflow),
        )
    os.replace(tmp, path)


def load_map_checkpoint(path: str) -> Optional[Tuple[object, int, dict]]:
    """Returns (SigTable, total_reads, stream_state) or None if absent."""
    from ..map.signature import SigTable

    if not os.path.exists(path):
        return None
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["format"] != FORMAT:
            raise ValueError(f"checkpoint format {meta['format']} != {FORMAT}")
        table = SigTable(
            key=jnp.asarray(z["key"]),
            count=jnp.asarray(z["count"]),
            sig=jnp.asarray(z["sig"]),
            overflow=jnp.asarray(z["overflow"]),
        )
        return table, meta["total_reads"], meta["stream_state"]


def save_em_snapshot(path: str, alpha: np.ndarray, iteration: int) -> None:
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, alpha=np.asarray(alpha),
                            iteration=np.int64(iteration))
    os.replace(tmp, path)


def load_em_snapshot(path: str) -> Optional[Tuple[np.ndarray, int]]:
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return z["alpha"], int(z["iteration"])

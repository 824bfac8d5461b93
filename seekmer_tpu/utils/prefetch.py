"""P3 — software-pipelined ingest (SURVEY.md 2.2): a background thread
drains the (host-bound) FASTQ decode/pack generator into a bounded queue
while the main thread dispatches device steps. Combined with JAX's async
dispatch and donated signature tables, steady state overlaps host parse,
H2D copy, and device compute. The reference's analog is its reader
process feeding the worker pool (SURVEY.md 2.1 C6)."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(items: Iterable[T], depth: int = 4) -> Iterator[T]:
    """Iterate ``items`` on a daemon thread, buffering up to ``depth``."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    error = []

    def worker():
        try:
            for item in items:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            error.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if error:
                raise error[0]
            return
        yield item

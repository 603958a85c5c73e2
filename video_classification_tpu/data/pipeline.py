"""Host-side prefetching with device double buffering.

The reference overlaps data loading with compute via torch DataLoader worker
processes (train.py:157-170). The TPU-native equivalent: a background thread pulls
host batches from the (possibly native-C++-backed) dataset iterator and eagerly
``device_put``s them with the batch sharding, keeping ``depth`` batches in flight so
the accelerator never waits on the host (cfg.TPU.PREFETCH_DEPTH).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

from ..parallel import shard_batch


class _End:
    pass


class _Error:
    def __init__(self, exc):
        self.exc = exc


def prefetch_to_device(batches: Iterator[Any], mesh, depth: int = 2,
                       put=None) -> Iterator[Any]:
    """Wrap a host batch iterator: batches arrive already sharded on device.

    The producer thread performs shard_batch (host->HBM transfer starts
    asynchronously inside device_put), so transfer of batch N+1 overlaps the
    computation of batch N. ``put(mesh, batch)`` overrides the transfer —
    the multi-host Trainer passes `multihost.global_batch_from_local` so each
    process uploads only its local rows.
    """
    if put is None:
        put = shard_batch
    if depth <= 0:
        for batch in batches:
            yield put(mesh, batch)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        try:
            for batch in batches:
                q.put(put(mesh, batch))
        except BaseException as e:  # surfaced in the consumer
            q.put(_Error(e))
            return
        q.put(_End())

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if isinstance(item, _End):
            break
        if isinstance(item, _Error):
            raise item.exc
        yield item
    thread.join()

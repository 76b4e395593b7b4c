"""Background batch prefetching (host->device pipeline).

The reference relies on torch DataLoader worker processes for pipeline
overlap (loader_workers=4 in every config). The TPU-native equivalent:
a daemon thread prepares and device_puts the NEXT batch while the
current step runs, so host slicing/transfer hides behind device compute.
Queue depth 2 = classic double buffering.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch(batches: Iterable[Any], depth: int = 2,
             to_device: bool = True) -> Iterator[Any]:
    """Wrap a batch iterable with background preparation + transfer."""
    q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
    err: list = []

    def worker():
        try:
            for b in batches:
                if to_device:
                    b = jax.tree_util.tree_map(jax.device_put, b)
                q.put(b)
        except BaseException as e:  # surface worker errors to consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item

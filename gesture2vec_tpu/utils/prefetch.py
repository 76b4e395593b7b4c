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
from typing import Any, Iterable, Iterator

import jax

_SENTINEL = object()


def prefetch(batches: Iterable[Any], depth: int = 2,
             to_device: bool = True,
             place: Any = None) -> Iterator[Any]:
    """Wrap a batch iterable with background preparation + transfer.

    place: optional callable applied to each batch in the worker thread
    instead of the default device_put — pass parallel.mesh.batch_placer
    so dp-sharded placement also happens behind device compute.

    The worker polls a stop event between puts so an abandoned consumer
    (exception mid-epoch, generator GC'd) releases the thread and its
    device-resident buffers instead of blocking on q.put forever.
    """
    q: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def worker():
        try:
            for b in batches:
                if place is not None:
                    b = place(b)
                elif to_device:
                    b = jax.tree_util.tree_map(jax.device_put, b)
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface worker errors to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.5)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()

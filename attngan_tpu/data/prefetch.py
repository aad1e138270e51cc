"""Host->device input pipeline with background prefetch.

The reference's DataLoader blocks the train loop on host-side batch assembly
(single process, num_workers default 0). Here a daemon thread prepares the
next host batches and enqueues their device transfers while the current
step is executing, so the TPU never waits on the host for small batches
(the reference's per-batch `.cuda()` h2d stall, train.py:110).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = object()


def prefetch(iterator: Iterator, transform: Optional[Callable] = None,
             depth: int = 2) -> Iterator:
    """Wrap ``iterator``, applying ``transform`` (e.g. Dataset.device_batch +
    shard_batch) in a background thread, keeping up to ``depth`` results in
    flight. Device puts are async in JAX, so enqueuing the transfer early
    overlaps h2d DMA with the current step's compute."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []

    def worker():
        try:
            for item in iterator:
                q.put(transform(item) if transform is not None else item)
        except BaseException as e:  # surface worker errors in the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item

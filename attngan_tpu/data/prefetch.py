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
    overlaps h2d DMA with the current step's compute.

    Shutdown-safe: when the consumer stops early (break / generator close,
    e.g. ``iter_attention_maps(limit=...)``), the worker is signalled and
    exits instead of blocking forever on a full queue holding device
    batches — otherwise every early exit leaked one thread plus up to
    ``depth + 1`` in-flight batches for the process lifetime."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that aborts once the consumer has gone away
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not _put(transform(item) if transform is not None
                            else item):
                    return
                if stop.is_set():
                    # consumer went away while the put was in flight: drop
                    # out now instead of leaving one more (possibly
                    # device-resident) batch referenced by the queue
                    return
        except BaseException as e:  # surface worker errors in the consumer
            err.append(e)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
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
        try:  # unblock a worker mid-put by draining queued items
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        if err:
            # the consumer closed early AND the worker had already failed:
            # don't let the pipeline error vanish with the generator
            import logging

            logging.getLogger(__name__).warning(
                "prefetch worker failed but the consumer exited early; "
                "suppressed error was: %r", err[0])

"""Prefetching input pipeline."""

import time

import pytest

from attngan_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_transform():
    out = list(prefetch(iter(range(10)), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(10)]


def test_prefetch_overlaps_producer_latency():
    def slow_source():
        for i in range(5):
            time.sleep(0.05)
            yield i

    start = time.perf_counter()
    for _ in prefetch(slow_source(), depth=2):
        time.sleep(0.05)  # consumer work overlapping producer work
    elapsed = time.perf_counter() - start
    # serial would be ~0.5s; overlapped should be well under
    assert elapsed < 0.45, f"no overlap: {elapsed:.3f}s"


def test_prefetch_early_exit_stops_worker():
    """Abandoning the generator (e.g. iter_attention_maps(limit=...)) must
    terminate the worker thread instead of leaving it blocked on q.put
    holding device batches for the process lifetime."""
    import threading

    produced = []

    def source():
        for i in range(1000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = prefetch(source(), depth=2)
    assert next(it) == 0
    it.close()  # early exit: consumer walks away after one item
    deadline = time.perf_counter() + 5.0
    while threading.active_count() > before and time.perf_counter() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before, "prefetch worker leaked"
    # the worker stopped near where the consumer did, not at exhaustion
    assert len(produced) < 20


def test_prefetch_propagates_worker_errors():
    def bad_source():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad_source(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)

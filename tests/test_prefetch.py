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


def test_prefetch_propagates_worker_errors():
    def bad_source():
        yield 1
        raise ValueError("boom")

    it = prefetch(bad_source(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)

import numpy as np
import pytest
from snnimageclassification_tpu.data.prefetch import prefetch_to_device


def test_yields_all_in_order():
    batches = [(np.full((2,), i), np.full((2,), -i)) for i in range(7)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 7
    for i, (x, y) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(x), i)
        np.testing.assert_array_equal(np.asarray(y), -i)


def test_producer_exception_propagates():
    def gen():
        yield (np.zeros(2),)
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_empty_iterable():
    assert list(prefetch_to_device(iter([]), size=2)) == []


def test_abandoned_consumer_releases_producer():
    import threading
    import time

    started = threading.Event()

    def gen():
        for i in range(100):
            started.set()
            yield (np.full((2,), i),)

    before = threading.active_count()
    it = prefetch_to_device(gen(), size=1)
    next(it)
    assert started.is_set()
    it.close()  # abandon mid-stream (triggers GeneratorExit -> stop event)
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread stuck"

"""Async host input pipeline (``yoho_tpu/utils/prefetch.py``)."""

import time

from yoho_tpu.utils.prefetch import prefetch


def test_prefetch_yields_all_in_order():
    got = list(prefetch(lambda k: k * k, range(7), depth=3))
    assert got == [(k, k * k) for k in range(7)]


def test_prefetch_overlaps_host_and_consumer():
    """With prep and consumption each 20 ms, a depth-2 pipeline must
    hide most of the prep latency (serial would wait ~20 ms/item)."""

    def prep(k):
        time.sleep(0.02)
        return k

    it = prefetch(prep, range(8), depth=2, workers=2)
    for _k, _v in it:
        time.sleep(0.02)  # "device" work
    # first item always waits ~20 ms; the rest should be prefetched
    assert it.wait_s < 8 * 0.02 * 0.6, it.wait_s


def test_prefetch_empty():
    assert list(prefetch(lambda k: k, [], depth=2)) == []

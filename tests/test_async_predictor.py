"""AsyncPredictor pipelining (reference demo/predictors.py:166-318)."""

import time

import numpy as np

from demo.predictors import AsyncPredictor


def test_results_in_order_and_complete():
    frames = list(range(10))
    pred = AsyncPredictor(
        preprocess=lambda f: f * 2,
        infer=lambda x: x + 1,
        fetch=lambda d: d,
        max_in_flight=3,
    )
    out = list(pred(frames))
    assert [f for f, _ in out] == frames
    assert [r for _, r in out] == [f * 2 + 1 for f in frames]


def test_overlap_beats_sequential():
    """Host 'preprocess' and device 'infer' sleeping concurrently must beat
    their serial sum."""
    n, d = 8, 0.05

    def preprocess(f):
        time.sleep(d)
        return f

    class Handle:
        def __init__(self, f):
            self.f = f
            self.t = time.time()

    def infer(x):
        return Handle(x)  # async dispatch: returns immediately

    def fetch(h):
        # device finished d seconds after dispatch
        remaining = h.t + d - time.time()
        if remaining > 0:
            time.sleep(remaining)
        return h.f

    pred = AsyncPredictor(preprocess, infer, fetch, max_in_flight=3)
    t0 = time.time()
    out = list(pred(range(n)))
    elapsed = time.time() - t0
    assert len(out) == n
    serial = n * 2 * d
    assert elapsed < serial * 0.8, (elapsed, serial)

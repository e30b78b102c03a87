"""Pipelined predictors for the demo (reference demo/predictors.py:166-318).

The reference's AsyncPredictor spreads DefaultPredictor replicas over
multiple GPUs with task/result process queues.  The TPU-native equivalent
exploits JAX's asynchronous dispatch instead: one jitted executable on the
chip, a host thread decoding/preprocessing frames ahead, and a bounded
in-flight window so device compute of frame N overlaps host work on frames
N+1..N+k.  On a single chip this saturates the device without process
replicas; on a pod the same structure runs per-host.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Tuple

import numpy as np


class AsyncPredictor:
    """Overlap host preprocessing with device inference.

    ``preprocess``: frame -> model input (numpy, host-side);
    ``infer``: model input -> device outputs (jitted; returns jax arrays —
    dispatch is async so the call returns before the chip finishes);
    ``fetch``: device outputs -> host results (forces the transfer).
    """

    def __init__(
        self,
        preprocess: Callable,
        infer: Callable,
        fetch: Callable,
        max_in_flight: int = 3,
        queue_size: int = 8,
    ):
        self.preprocess = preprocess
        self.infer = infer
        self.fetch = fetch
        self.max_in_flight = max_in_flight
        self.queue_size = queue_size

    def __call__(self, frames: Iterable) -> Iterator[Tuple[object, object]]:
        """Yields (frame, host_results) in order."""
        pre_q: "queue.Queue" = queue.Queue(maxsize=self.queue_size)
        _END = object()

        def producer():
            for frame in frames:
                pre_q.put((frame, self.preprocess(frame)))
            pre_q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        in_flight = []
        while True:
            item = pre_q.get()
            if item is _END:
                break
            frame, inp = item
            in_flight.append((frame, self.infer(inp)))  # async dispatch
            if len(in_flight) >= self.max_in_flight:
                f, dev = in_flight.pop(0)
                yield f, self.fetch(dev)
        for f, dev in in_flight:
            yield f, self.fetch(dev)
        t.join()


def webcam_frames(camera: int = 0, max_frames: Optional[int] = None):
    """Frame generator for --input webcam (reference demo.py --webcam)."""
    import cv2

    cap = cv2.VideoCapture(camera)
    if not cap.isOpened():
        raise SystemExit(f"cannot open camera {camera}")
    n = 0
    try:
        while max_frames is None or n < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame[..., ::-1]  # BGR -> RGB
            n += 1
    finally:
        cap.release()


def video_frames(path: str):
    """Frame generator over a video file, plus (fps, writer factory)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise SystemExit(f"cannot open video {path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield frame[..., ::-1]
    finally:
        cap.release()

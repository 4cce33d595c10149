"""Presentation: triple-buffered async device->host readback.

The reference's swapchain + fence machinery (3 backbuffers, per-buffer fence values,
CPU blocks only when >3 frames are in flight; main.cpp:84, 108-111, 167-171,
337-341) maps onto JAX's async dispatch model: every jitted render call returns
immediately with a future-like Array; holding a bounded deque of those arrays IS the
fence — the CPU only blocks (np.asarray == fence wait) when it pops a frame whose
computation hasn't finished, and enqueueing beyond the queue depth applies
backpressure exactly like the reference's fence wait at the top of the frame loop.
"""
from __future__ import annotations

from collections import deque
from typing import Optional

import numpy as np


class PresentQueue:
    """Bounded queue of in-flight device frames (default depth 3 = triple buffer)."""

    def __init__(self, depth: int = 3):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.depth = depth
        self._queue: deque = deque()
        self.frames_presented = 0

    def push(self, device_frame) -> Optional[np.ndarray]:
        """Submit a rendered frame.  If the queue is full, the OLDEST frame is
        presented (synchronizing with the device only as needed) and returned —
        the analog of the fence wait at main.cpp:167-171."""
        self._queue.append(device_frame)
        if len(self._queue) > self.depth:
            return self.present_next()
        return None

    def present_next(self) -> Optional[np.ndarray]:
        """Present (download) the oldest in-flight frame; None if empty."""
        if not self._queue:
            return None
        frame = self._queue.popleft()
        host = np.asarray(frame)  # blocks iff the device hasn't finished
        self.frames_presented += 1
        return host

    def drain(self):
        """Present every remaining in-flight frame (teardown)."""
        while self._queue:
            yield self.present_next()

    @property
    def in_flight(self) -> int:
        return len(self._queue)

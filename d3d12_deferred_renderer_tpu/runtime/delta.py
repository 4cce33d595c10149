"""Delta presentation: transfer only CHANGED tiles of each frame to the host.

The reference presents with plain `Present(1, 0)` (main.cpp:337), but its flip-
model swapchain family exists precisely to let the present path skip unchanged
content (DXGI `Present1` dirty rects).  On this target the present cost is the
device->host readback — 6 MB/frame at 1080p over a link that is the delivered-
FPS bottleneck in tunneled/remote setups — so the TPU-native analog packs the
frame into fixed-shape tiles ON DEVICE, compacts the tiles that differ from the
previous presented frame to the front of a static buffer (the same fixed-
capacity + compaction philosophy as the rasterizer's binning), and the host
reads only a power-of-two-rounded prefix, reconstructing the frame from its own
copy of the previous one.  Static pixels (backgrounds, settled geometry) never
cross the link again.

Exactness: reconstruction is bit-identical to a full readback — a tile is
transferred iff ANY byte differs, so the host mirror never drifts.  The
power-of-two rounding bounds the per-frame program count (one sliced readback
program per bucket, compiled once each) while transferring at most 2x the
changed bytes.
"""
from __future__ import annotations

from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pick_tile(size: int, preferred: int) -> int:
    """Largest divisor of `size` that is <= preferred (>= 1)."""
    t = min(preferred, size)
    while size % t:
        t -= 1
    return t


@partial(jax.jit, static_argnums=(2, 3))
def _pack_tiles(prev: jnp.ndarray, frame: jnp.ndarray, th: int, tw: int):
    """Compact changed tiles to the front: (count, order[NT], pixels[NT, B]).

    `order` lists changed tile indices first (ascending), unchanged after;
    `pixels` holds every tile of `frame` gathered in that order, so rows
    [:count] are exactly the dirty tiles' bytes."""
    H, W, C = frame.shape
    TH, TW = H // th, W // tw

    def tiles(x):
        return (
            x.reshape(TH, th, TW, tw, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(TH * TW, th * tw * C)
        )

    t_new = tiles(frame)
    changed = jnp.any(t_new != tiles(prev), axis=1)
    count = changed.sum(dtype=jnp.int32)
    # Stable: among changed (and among unchanged) tiles, ascending tile index.
    order = jnp.argsort(~changed, stable=True).astype(jnp.int32)
    pixels = jnp.take(t_new, order, axis=0)
    return count, order, pixels


@partial(jax.jit, static_argnums=(1,))
def _prefix(pixels: jnp.ndarray, k: int) -> jnp.ndarray:
    return pixels[:k]


class DeltaPresentQueue:
    """Bounded queue of in-flight frames presented via dirty-tile deltas.

    Same contract as `PresentQueue` (push returns the oldest presented frame
    once `depth` frames are in flight; present_next/drain download in order)
    but each download moves only the power-of-two-rounded prefix of changed
    tiles.  `bytes_transferred` / `bytes_full` expose the savings."""

    def __init__(
        self, height: int, width: int, depth: int = 3,
        tile_h: int = 8, tile_w: int = 64, channels: int = 3,
    ):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.depth = depth
        self.th = _pick_tile(height, tile_h)
        self.tw = _pick_tile(width, tile_w)
        self.H, self.W, self.C = height, width, channels
        self.TH, self.TW = height // self.th, width // self.tw
        self.NT = self.TH * self.TW
        self.tile_bytes = self.th * self.tw * channels
        self._queue: deque = deque()
        # prev on DEVICE feeds the next pack; the host mirror reconstructs.
        self._prev = jnp.zeros((height, width, channels), jnp.uint8)
        self._host = np.zeros((self.NT, self.tile_bytes), np.uint8)
        self.frames_presented = 0
        self.bytes_transferred = 0
        self.bytes_full = 0

    def push(self, device_frame) -> Optional[np.ndarray]:
        """Submit a rendered device frame; returns the OLDEST frame (as a host
        uint8 [H, W, 3] array) when the queue is full, else None."""
        packed = _pack_tiles(self._prev, device_frame, self.th, self.tw)
        self._prev = device_frame
        self._queue.append(packed)
        if len(self._queue) > self.depth:
            return self.present_next()
        return None

    def present_next(self) -> Optional[np.ndarray]:
        if not self._queue:
            return None
        count, order, pixels = self._queue.popleft()
        c = int(count)  # blocks iff the device hasn't finished (fence wait)
        if c:
            k = 1 << (c - 1).bit_length()  # pow2 readback bucket
            idx = np.asarray(order)[:c]
            tiles = np.asarray(_prefix(pixels, k))[:c]
            self._host[idx] = tiles
            self.bytes_transferred += k * self.tile_bytes + order.nbytes + 4
        else:
            self.bytes_transferred += 4
        self.bytes_full += self.NT * self.tile_bytes
        self.frames_presented += 1
        return (
            self._host.reshape(self.TH, self.TW, self.th, self.tw, self.C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(self.H, self.W, self.C)
        )

    def drain(self):
        while self._queue:
            yield self.present_next()

    @property
    def in_flight(self) -> int:
        return len(self._queue)

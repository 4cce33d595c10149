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


def _bucket(x: int) -> int:
    """Smallest quarter-pow2 step >= x (… 8, 10, 12, 14, 16, 20, 24, 28, 32 …):
    bounds the compiled pack-program count to ~4 per octave while capping the
    speculative-prefix overshoot at 25% (plain pow2 overshoots up to 100%)."""
    if x <= 8:
        return max(1, x)
    p = 1 << (x.bit_length() - 1)  # pow2 floor
    q = p // 4
    return p + q * (-(-(x - p) // q))


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


@partial(jax.jit, static_argnums=(3,))
def _pack_transfer(count, order, pixels, cap: int) -> jnp.ndarray:
    """ONE device buffer holding everything a present needs:
    [4B count][cap*4B dirty-order prefix][cap*tile_bytes pixel prefix].

    The host then presents with a SINGLE device->host transfer instead of
    three (count readback -> order -> pixel prefix) — each readback over a
    tunneled/remote link pays a full round trip, and the serialized trio was
    the measured bottleneck of the rotating-scene delivered rate (BENCH.md).
    `cap` is speculative (chosen from previously observed dirty counts); a
    frame dirtier than the cap takes a second transfer for the remainder."""
    hdr = jax.lax.bitcast_convert_type(
        count.reshape(1), jnp.uint8
    ).reshape(-1)
    idx = jax.lax.bitcast_convert_type(order[:cap], jnp.uint8).reshape(-1)
    return jnp.concatenate([hdr, idx, pixels[:cap].reshape(-1)])


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
        # Speculative single-transfer tile cap: starts at NT (the first
        # present moves every tile anyway), then tracks observed dirty counts
        # with 1.5x headroom.  A frame dirtier than the cap costs one extra
        # transfer (counted in transfer_misses), never a wrong frame.
        self._spec = self.NT
        self.transfer_misses = 0

    def push(self, device_frame) -> Optional[np.ndarray]:
        """Submit a rendered device frame; returns the OLDEST frame (as a host
        uint8 [H, W, 3] array) when the queue is full, else None."""
        count, order, pixels = _pack_tiles(
            self._prev, device_frame, self.th, self.tw
        )
        self._prev = device_frame
        # Build the single-transfer buffer NOW (speculative cap) and start
        # its device->host copy asynchronously: by the time this frame is
        # presented (depth frames later) the bytes have crossed the link
        # UNDER the following frames' renders instead of serializing after
        # them.
        cap = self._spec
        buf = _pack_transfer(count, order, pixels, cap)
        try:
            buf.copy_to_host_async()
        except AttributeError:  # non-jax arrays in tests / CPU fallbacks
            pass
        self._queue.append((cap, buf, count, order, pixels))
        if len(self._queue) > self.depth:
            return self.present_next()
        return None

    def present_next(self) -> Optional[np.ndarray]:
        if not self._queue:
            return None
        cap, dbuf, count, order, pixels = self._queue.popleft()
        # ONE device->host transfer per present (count + dirty order prefix +
        # dirty pixel prefix packed device-side at push, copy already in
        # flight — _pack_transfer docstring).  The old three serialized
        # readbacks paid three link round trips AFTER the render.
        buf = np.asarray(dbuf)
        self.bytes_transferred += buf.nbytes
        c = int(buf[:4].view(np.int32)[0])
        take = min(c, cap)
        if take:
            idx = buf[4 : 4 + 4 * cap].view(np.int32)[:take]
            tiles = buf[4 + 4 * cap :].reshape(cap, self.tile_bytes)[:take]
            self._host[idx] = tiles
        if c > cap:
            # Speculation miss: one extra transfer for the remainder.
            self.transfer_misses += 1
            k = 1 << (c - 1).bit_length()
            idx_rest = np.asarray(order)[cap:c]
            rest = np.asarray(_prefix(pixels, k))[cap:c]
            self._host[idx_rest] = rest
            self.bytes_transferred += (
                k * self.tile_bytes + self.NT * 4
            )
        # Track observed dirty counts with 15% headroom on quarter-pow2
        # buckets (pow2 buckets overshoot up to 2x — at ~1.5 KB/tile the
        # overshoot bytes cost more than the round trips they were meant to
        # save); decay to 0 on a clean frame so settled scenes move only the
        # 4-byte count again (the first change after a settle pays one miss
        # — the right trade: misses cost one extra transfer, static frames
        # are forever).
        if c == 0:
            self._spec = 0
        else:
            self._spec = min(self.NT, _bucket(int(c * 1.15) + 1))
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

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

Round 5 adds a PIXEL-level wire encoding on top (default ON): within the
dirty-tile prefix, only ~13% of pixels actually change per frame on the
rotating benchmark scene (tools/delta_probe.py, 2026-08-21), so the buffer
ships per-tile dirty-pixel bitmaps + just the changed pixels' bytes —
measured ~5.8x fewer wire bytes (1.16 -> 0.20 MB/frame) on the link that
bounds delivered FPS.  Both caps (dirty tiles, changed pixels) are
speculative with loud miss handling; reconstruction stays bit-identical
because unchanged pixels inside dirty tiles equal the host mirror's bytes by
the mirror invariant.
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
    """Compact changed tiles to the front:
    (count, order[NT], pixels[NT, B], prev_tiles[NT, B]).

    `order` lists changed tile indices first (ascending), unchanged after;
    `pixels` holds every tile of `frame` gathered in that order, so rows
    [:count] are exactly the dirty tiles' bytes.  `prev_tiles` is the previous
    frame in tile layout (UNordered) — the pixel-level pack gathers its dirty
    prefix to mask unchanged pixels inside dirty tiles."""
    H, W, C = frame.shape
    TH, TW = H // th, W // tw

    def tiles(x):
        return (
            x.reshape(TH, th, TW, tw, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(TH * TW, th * tw * C)
        )

    t_new = tiles(frame)
    t_prev = tiles(prev)
    changed = jnp.any(t_new != t_prev, axis=1)
    count = changed.sum(dtype=jnp.int32)
    # Stable: among changed (and among unchanged) tiles, ascending tile index.
    order = jnp.argsort(~changed, stable=True).astype(jnp.int32)
    pixels = jnp.take(t_new, order, axis=0)
    return count, order, pixels, t_prev


@partial(jax.jit, static_argnums=(1,))
def _prefix(pixels: jnp.ndarray, k: int) -> jnp.ndarray:
    return pixels[:k]


@partial(jax.jit, static_argnums=(4, 5, 6))
def _pack_transfer_px(
    count, order, pixels, prev_tiles, cap: int, px_cap: int, channels: int
) -> jnp.ndarray:
    """Pixel-level single-transfer buffer (the round-5 wire encoding):

      [4B count][4B npx][cap*4B dirty order][cap*ceil(P/8)B pixel bitmaps]
      [px_cap*C B changed pixels]

    Measured on the rotating benchmark scene (tools/delta_probe.py,
    2026-08-21): only ~13% of the pixels inside dirty 8x64 tiles actually
    change per frame, so masking unchanged pixels cuts the wire bytes ~5.8x
    vs raw dirty tiles (1.16 -> 0.20 MB/frame) — the delta-present link was
    bandwidth-bound on exactly those bytes (BENCH.md).  The bitmap is
    little-bit-order (np.unpackbits(bitorder='little')); changed pixels ride
    in ascending flat (dirty-tile-rank, pixel) order, so the host
    reconstructs positions from the bitmaps alone.  Reconstruction stays
    bit-identical: unchanged pixels inside dirty tiles equal the host
    mirror's bytes by the mirror invariant."""
    B = pixels.shape[1]
    C = channels
    P = B // C
    Pp = -(-P // 8) * 8
    tn = pixels[:cap]
    tp = prev_tiles[order[:cap]]
    m = jnp.any(
        tn.reshape(cap, P, C) != tp.reshape(cap, P, C), axis=2
    )  # [cap, P]; rows past `count` compare a tile to itself -> all False
    npx = m.sum(dtype=jnp.int32)
    mp = jnp.pad(m, ((0, 0), (0, Pp - P)))
    bitmap = jnp.sum(
        mp.reshape(cap, Pp // 8, 8).astype(jnp.uint8)
        << jnp.arange(8, dtype=jnp.uint8),
        axis=-1,
        dtype=jnp.uint8,
    )
    flat = m.reshape(-1)
    iota = jnp.arange(cap * P, dtype=jnp.int32)
    key = jnp.where(flat, iota, cap * P)
    ordpx = jnp.argsort(key)[:px_cap]  # ascending changed flat indices first
    px = tn.reshape(cap * P, C)[ordpx]
    hdr = jax.lax.bitcast_convert_type(
        jnp.stack([count, npx]), jnp.uint8
    ).reshape(-1)
    idx = jax.lax.bitcast_convert_type(order[:cap], jnp.uint8).reshape(-1)
    return jnp.concatenate(
        [hdr, idx, bitmap.reshape(-1), px.reshape(-1)]
    )


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
        pixel_level: bool = True,
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
        self.tile_px = self.th * self.tw
        self._bmp_bytes = -(-self.tile_px // 8)  # per-tile bitmap bytes
        # Pixel-level wire encoding (see _pack_transfer_px): ships per-pixel
        # dirty bitmaps + only changed pixels' bytes for the dirty prefix —
        # measured ~5.8x fewer wire bytes on the rotating benchmark scene.
        self.pixel_level = pixel_level
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
        # Speculative changed-pixel cap for the pixel-level buffer, tracked
        # from observed counts exactly like the tile cap.
        self._spec_px = self.NT * self.tile_px
        self.transfer_misses = 0

    def _px_mode(self, cap: int, px_cap: int) -> bool:
        """Use the pixel-level buffer iff its (static) size undercuts the raw
        dirty-tile buffer — automatically falls back to raw on full-dirty
        first frames or bitmap-dominated tiny caps."""
        if not self.pixel_level or cap == 0:
            return False
        raw = cap * self.tile_bytes
        px = cap * self._bmp_bytes + px_cap * self.C + 4
        return px < raw

    def push(self, device_frame) -> Optional[np.ndarray]:
        """Submit a rendered device frame; returns the OLDEST frame (as a host
        uint8 [H, W, 3] array) when the queue is full, else None."""
        count, order, pixels, prev_tiles = _pack_tiles(
            self._prev, device_frame, self.th, self.tw
        )
        self._prev = device_frame
        # Build the single-transfer buffer NOW (speculative caps) and start
        # its device->host copy asynchronously: by the time this frame is
        # presented (depth frames later) the bytes have crossed the link
        # UNDER the following frames' renders instead of serializing after
        # them.
        cap = self._spec
        px_cap = min(self._spec_px, cap * self.tile_px)
        if self._px_mode(cap, px_cap):
            buf = _pack_transfer_px(
                count, order, pixels, prev_tiles, cap, px_cap, self.C
            )
            mode = "px"
        else:
            buf = _pack_transfer(count, order, pixels, cap)
            mode = "raw"
            px_cap = 0
        try:
            buf.copy_to_host_async()
        except AttributeError:  # non-jax arrays in tests / CPU fallbacks
            pass
        self._queue.append((mode, cap, px_cap, buf, count, order, pixels))
        if len(self._queue) > self.depth:
            return self.present_next()
        return None

    def present_next(self) -> Optional[np.ndarray]:
        if not self._queue:
            return None
        mode, cap, px_cap, dbuf, count, order, pixels = self._queue.popleft()
        # ONE device->host transfer per present (count + dirty order prefix +
        # dirty payload packed device-side at push, copy already in flight —
        # _pack_transfer/_pack_transfer_px docstrings).  The old three
        # serialized readbacks paid three link round trips AFTER the render.
        buf = np.asarray(dbuf)
        self.bytes_transferred += buf.nbytes
        c = int(buf[:4].view(np.int32)[0])
        take = min(c, cap)
        npx = None  # observed changed-pixel count (px mode only)
        if mode == "px":
            npx = int(buf[4:8].view(np.int32)[0])
            off = 8
            idx = buf[off : off + 4 * cap].view(np.int32)[:take]
            off += 4 * cap
            bmp = buf[off : off + cap * self._bmp_bytes].reshape(
                cap, self._bmp_bytes
            )[:take]
            off += cap * self._bmp_bytes
            px = buf[off:].reshape(px_cap, self.C)
            if take:
                bits = np.unpackbits(bmp, axis=1, bitorder="little")[
                    :, : self.tile_px
                ]
                pos = np.flatnonzero(bits)  # ascending == device pixel order
                tiles_buf = self._host[idx]  # prev content, by the invariant
                flat_px = tiles_buf.reshape(take * self.tile_px, self.C)
                nv = min(npx, px_cap)
                flat_px[pos[:nv]] = px[:nv]
                if npx > px_cap:
                    # Pixel-speculation miss: the missing pixels are the TAIL
                    # of the ascending flat order, i.e. they live in the last
                    # rows of the dirty prefix — re-transfer those tiles raw.
                    self.transfer_misses += 1
                    first_bad = int(pos[px_cap]) // self.tile_px
                    k = 1 << max(take - 1, 1).bit_length()
                    rest = np.asarray(_prefix(pixels, k))[first_bad:take]
                    tiles_buf[first_bad:take] = rest
                    self.bytes_transferred += k * self.tile_bytes
                self._host[idx] = tiles_buf
        elif take:
            idx = buf[4 : 4 + 4 * cap].view(np.int32)[:take]
            tiles = buf[4 + 4 * cap :].reshape(cap, self.tile_bytes)[:take]
            self._host[idx] = tiles
        if c > cap:
            # Tile-speculation miss: one extra transfer for the remainder.
            self.transfer_misses += 1
            k = 1 << (c - 1).bit_length()
            idx_rest = np.asarray(order)[cap:c]
            rest = np.asarray(_prefix(pixels, k))[cap:c]
            self._host[idx_rest] = rest
            self.bytes_transferred += (
                k * self.tile_bytes + self.NT * 4
            )
            npx = None  # pixel count unseen past the cap: don't decay _spec_px
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
        if npx is not None:
            self._spec_px = min(
                self.NT * self.tile_px, _bucket(int(npx * 1.15) + 1)
            )
        elif c > 0:
            # Raw presents (and tile-miss px presents) don't observe the true
            # pixel count; seed the pixel cap at HALF the tile cap's pixels
            # (the rotating benchmark measures ~13% changed,
            # tools/delta_probe.py — half engages px mode while covering most
            # scenes without a miss) — an underestimate costs one pixel-miss
            # transfer, then the observed count takes over.
            self._spec_px = max(
                1, _bucket(self._spec * self.tile_px // 2)
            )
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

"""Measure the delta-present payload's compressibility on real rotating
frames, to pick the round-5 wire encoding (VERDICT r4: rotating delivered
19.1 FPS is dirty-byte-bandwidth-bound at ~1.5 MB/frame over ~28 MB/s; the
payload crosses the link RAW).

Renders N consecutive rotating flagship frames on-chip, pulls them to the
host once (probe cost, not protocol cost), and reports per candidate device-
side encoding the exact bytes/frame it would put on the wire:

  raw-dirty @ tile sizes     — the shipped protocol at 8x64 / 8x32 / 8x16 / 4x32
  pixel-mask + changed px    — 1 bit/px dirty bitmap over dirty tiles + only
                               changed pixels' bytes
  nibble residual            — zigzag(new - prev) per byte of dirty tiles:
                               4-bit codes with full-byte escapes (code 15)
  nibble residual + mask     — both
  zlib(raw dirty) / zlib(xor)— HOST-side entropy reference (NOT device-
                               feasible; bounds what any scheme could get)

Run: python tools/delta_probe.py [--frames 12]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import zlib

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def tiles(x, th, tw):
    H, W, C = x.shape
    return (
        x.reshape(H // th, th, W // tw, tw, C)
        .transpose(0, 2, 1, 3, 4)
        .reshape((H // th) * (W // tw), th * tw * C)
    )


def main():
    enable_compilation_cache()
    n_frames = 12
    if "--frames" in sys.argv:
        n_frames = int(sys.argv[sys.argv.index("--frames") + 1])

    on_tpu = jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=on_tpu, fused=on_tpu,
        **({} if on_tpu else {"width": 256, "height": 144}),
    )
    _, state, _ = build(cfg, **({} if on_tpu else {"n_meshes": 2, "n_lights": 16}))

    step = jax.jit(fr.step_frame, static_argnums=(1,))
    frames = []
    s = state
    for _ in range(n_frames + 1):
        s, f = step(s, cfg)
        frames.append(np.asarray(f))

    H, W, C = frames[0].shape
    full = H * W * C
    stats = {}

    def acc(name, v):
        stats.setdefault(name, []).append(v)

    for prev, new in zip(frames[:-1], frames[1:]):
        for th, tw in [(8, 64), (8, 32), (8, 16), (4, 32), (4, 16)]:
            tp, tn = tiles(prev, th, tw), tiles(new, th, tw)
            dirty = np.any(tp != tn, axis=1)
            nd = int(dirty.sum())
            tile_bytes = th * tw * C
            acc(f"raw-dirty {th}x{tw}", nd * tile_bytes + nd * 4 + 4)

        # The remaining encodings work on the shipped 8x64 dirty set.
        th, tw = 8, 64
        tp, tn = tiles(prev, th, tw), tiles(new, th, tw)
        dirty = np.any(tp != tn, axis=1)
        dp, dn = tp[dirty], tn[dirty]
        nd = int(dirty.sum())
        over = nd * 4 + 4  # order prefix + count, as shipped

        changed_b = dp != dn  # per-BYTE change mask
        px_changed = changed_b.reshape(nd, th * tw, C).any(axis=2)
        frac_px = px_changed.mean() if nd else 0.0
        acc("changed-px frac", frac_px)
        # 1 bit/px bitmap + changed pixels' 3 bytes
        acc(
            "pxmask+changed",
            over + nd * (th * tw // 8) + int(px_changed.sum()) * C,
        )

        # nibble residual: zigzag(new - prev) per byte; 4-bit codes, escape 15
        r = (dn.astype(np.int16) - dp.astype(np.int16))
        # interpret as wrapped s8 so +-small deltas are small either side of 0
        r8 = r.astype(np.int8).astype(np.int16)
        z = ((r8 << 1) ^ (r8 >> 15)).astype(np.uint16)  # zigzag
        esc = z >= 15
        acc("nibble esc frac", esc.mean() if nd else 0.0)
        acc(
            "nibble-resid",
            over + (dn.size + 1) // 2 + int(esc.sum()),
        )
        # nibble residual over CHANGED pixels only (mask + nibbles + escapes)
        zc = z.reshape(nd, th * tw, C)[px_changed] if nd else z[:0]
        escc = zc >= 15
        acc(
            "pxmask+nibble",
            over + nd * (th * tw // 8) + (zc.size + 1) // 2 + int(escc.sum()),
        )

        # host-side entropy references
        acc("zlib1(raw dirty)", over + len(zlib.compress(dn.tobytes(), 1)))
        xor = dp ^ dn
        acc("zlib1(xor dirty)", over + len(zlib.compress(xor.tobytes(), 1)))

    print(f"frames: {n_frames}  full={full / 1e6:.2f} MB  ({W}x{H})")
    link = 28e6  # measured tunnel MB/s (BENCH.md)
    for name, vals in stats.items():
        m = float(np.mean(vals))
        if "frac" in name:
            print(f"{name:>24}: {m:8.3f}")
        else:
            print(
                f"{name:>24}: {m / 1e6:8.3f} MB/frame "
                f"({m / full * 100:5.1f}% of full, "
                f"link-bound {link / m:6.1f} FPS)"
            )


if __name__ == "__main__":
    main()

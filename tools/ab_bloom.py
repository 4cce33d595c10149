"""A/B bloom formulations on-chip, isolated from the frame (fast compiles).

The shipped bloom (ops/post.py) works on [H, W, 3] with the 3-channel minor
dim — on TPU that can tile 3 lanes of 128 (42x lane waste) for every shifted
slice of the 2x17-tap blur, and jnp.repeat upsampling lowers as a gather.
Variants keep the EXACT accumulation order (band-exact bloom in
parallel/sharded.py depends on bit-equality), only the layout/lowering moves.

Usage: python tools/ab_bloom.py [-n 50]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from d3d12_deferred_renderer_tpu.ops.post import (
    BLOOM_DOWNSAMPLE,
    BLOOM_RADIUS,
    BLOOM_SIGMA,
    _blur_separable,
    _gaussian_kernel1d,
    bloom,
)
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

H, W = 1080, 1920


def _blur_separable_cf(img, sigma, radius):
    """Channel-first [3, H, W] variant of _blur_separable: same taps, same
    accumulation order, W in the lane dimension."""
    k = _gaussian_kernel1d(sigma, radius)
    _, h, w = img.shape
    taps = 2 * radius + 1
    x = jnp.pad(img, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    acc = None
    for i in range(taps):
        t = x[:, i : i + h] * k[i]
        acc = t if acc is None else acc + t
    x = jnp.pad(acc, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    acc = None
    for i in range(taps):
        t = x[:, :, i : i + w] * k[i]
        acc = t if acc is None else acc + t
    return acc


def bloom_cf(hdr, threshold, strength):
    """Channel-first quarter-res chain + broadcast upsample."""
    d = BLOOM_DOWNSAMPLE
    h, w, _ = hdr.shape
    bright = jnp.maximum(hdr - threshold, 0.0)
    ds = bright[::d, ::d].transpose(2, 0, 1)  # [3, h/d, w/d]
    blurred = _blur_separable_cf(ds, BLOOM_SIGMA, BLOOM_RADIUS)
    hd, wd = blurred.shape[1], blurred.shape[2]
    up = jnp.broadcast_to(
        blurred[:, :, None, :, None], (3, hd, d, wd, d)
    ).reshape(3, hd * d, wd * d)[:, :h, :w].transpose(1, 2, 0)
    return hdr + strength * up


def bloom_bcast_up(hdr, threshold, strength):
    """Shipped layout, but broadcast+reshape upsample instead of jnp.repeat."""
    d = BLOOM_DOWNSAMPLE
    h, w, _ = hdr.shape
    bright = jnp.maximum(hdr - threshold, 0.0)
    ds = bright[::d, ::d]
    blurred = _blur_separable(ds, BLOOM_SIGMA, BLOOM_RADIUS)
    hd, wd = blurred.shape[0], blurred.shape[1]
    up = jnp.broadcast_to(
        blurred[:, None, :, None, :], (hd, d, wd, d, 3)
    ).reshape(hd * d, wd * d, 3)[:h, :w]
    return hdr + strength * up


def timed(fn, hdr, n):
    @jax.jit
    def run(x):
        def step(c, _):
            y = fn(c, 1.0, 0.15)
            # evolve: feed a scaled slice back so nothing is DCE'd/cached
            return c * 0.999 + y * 0.001, None

        c, _ = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(c)

    float(run(hdr))
    t0 = time.time()
    float(run(hdr))
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    n = 50
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
    key = jax.random.PRNGKey(0)
    hdr = jax.random.uniform(key, (H, W, 3), jnp.float32, 0.0, 2.5)

    # parity first (CPU-free: on-device compare)
    a = bloom(hdr, 1.0, 0.15)
    for name, fn in (("cf", bloom_cf), ("bcast", bloom_bcast_up)):
        b = fn(hdr, 1.0, 0.15)
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"parity {name}: max |delta| {d:.3e}", flush=True)

    for name, fn in (
        ("shipped (HWC + repeat)", bloom),
        ("bcast upsample only", bloom_bcast_up),
        ("channel-first + bcast", bloom_cf),
    ):
        ms = timed(fn, hdr, n)
        print(f"{name:>24}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

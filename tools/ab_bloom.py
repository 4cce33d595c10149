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


def bloom_cf_repeat(hdr, threshold, strength):
    """Channel-first blur only; keep the shipped jnp.repeat upsample."""
    d = BLOOM_DOWNSAMPLE
    h, w, _ = hdr.shape
    bright = jnp.maximum(hdr - threshold, 0.0)
    ds = bright[::d, ::d].transpose(2, 0, 1)
    blurred = _blur_separable_cf(ds, BLOOM_SIGMA, BLOOM_RADIUS).transpose(1, 2, 0)
    up = jnp.repeat(jnp.repeat(blurred, d, 0), d, 1)[:h, :w]
    return hdr + strength * up


def bloom_r0(hdr, threshold, strength):
    """radius=0 (identity blur): isolates the blur cost from the full-res
    threshold/downsample/upsample/add traffic."""
    return bloom(hdr, threshold, strength, radius=0)


def bloom_flat(hdr, threshold, strength):
    """Blur on [h, w*3] (H-pass) then [w, h*3] via one transpose (W-pass):
    both passes shift along the MAJOR axis with a dense packed minor dim."""
    d = BLOOM_DOWNSAMPLE
    h, w, _ = hdr.shape
    bright = jnp.maximum(hdr - threshold, 0.0)
    ds = bright[::d, ::d]
    hd, wd, _ = ds.shape
    k = _gaussian_kernel1d(BLOOM_SIGMA, BLOOM_RADIUS)
    taps = 2 * BLOOM_RADIUS + 1
    r = BLOOM_RADIUS
    x = jnp.pad(ds.reshape(hd, wd * 3), ((r, r), (0, 0)), mode="edge")
    acc = None
    for i in range(taps):
        t = x[i : i + hd] * k[i]
        acc = t if acc is None else acc + t
    # W pass: transpose so w is major, channels stay minor-packed
    y = acc.reshape(hd, wd, 3).transpose(1, 0, 2).reshape(wd, hd * 3)
    y = jnp.pad(y, ((r, r), (0, 0)), mode="edge")
    acc = None
    for i in range(taps):
        t = y[i : i + wd] * k[i]
        acc = t if acc is None else acc + t
    blurred = acc.reshape(wd, hd, 3).transpose(1, 0, 2)
    up = jnp.repeat(jnp.repeat(blurred, d, 0), d, 1)[:h, :w]
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


def main_piecewise(n):
    """Decompose the bloom cost CHW-natively: which piece owns the time?"""
    from d3d12_deferred_renderer_tpu.ops.post import (
        _blur_separable_chw, bloom_chw,
    )

    key = jax.random.PRNGKey(0)
    hdr = jax.random.uniform(key, (3, H, W), jnp.float32, 0.0, 2.5)
    d = BLOOM_DOWNSAMPLE

    def identity(x, t, s):
        return x

    def add_only(x, t, s):
        return x + s * x

    def thresh_ds(x, t, s):
        # quarter-res product folded back via a scalar so shapes match
        ds = jnp.maximum(x - t, 0.0)[:, ::d, ::d]
        return x + jnp.sum(ds) * 1e-12

    def ds_blur(x, t, s):
        ds = jnp.maximum(x - t, 0.0)[:, ::d, ::d]
        bl = _blur_separable_chw(ds, BLOOM_SIGMA, BLOOM_RADIUS)
        return x + jnp.sum(bl) * 1e-12

    def ds_repeat_add(x, t, s):
        # no blur: isolates the upsample+add with the chain intact
        ds = jnp.maximum(x - t, 0.0)[:, ::d, ::d]
        up = jnp.repeat(jnp.repeat(ds, d, 1), d, 2)[:, :H, :W]
        return x + s * up

    def ds_bcast_add(x, t, s):
        ds = jnp.maximum(x - t, 0.0)[:, ::d, ::d]
        hd, wd = ds.shape[1], ds.shape[2]
        up = jnp.broadcast_to(
            ds[:, :, None, :, None], (3, hd, d, wd, d)
        ).reshape(3, hd * d, wd * d)[:, :H, :W]
        return x + s * up

    def _expand_mat(out_n, in_n):
        # E[Y, y] = 1 iff y == Y // d: a 0/1 selection matrix, so the MXU
        # contraction picks exactly one source element per output — bit-exact
        # nearest upsampling as a matmul instead of a gather-based repeat.
        Y = jnp.arange(out_n)[:, None]
        y = jnp.arange(in_n)[None, :]
        return (y == Y // d).astype(jnp.float32)

    E_h = _expand_mat(H, -(-H // d))
    E_w = _expand_mat(W, -(-W // d))

    def ds_mxu_add(x, t, s):
        ds = jnp.maximum(x - t, 0.0)[:, ::d, ::d]
        tmp = jnp.einsum("Yy,cyx->cYx", E_h, ds)
        up = jnp.einsum("cYx,Xx->cYX", tmp, E_w)
        return x + s * up

    for name, fn in (
        ("identity (harness)", identity),
        ("full-res add only", add_only),
        ("thresh+ds", thresh_ds),
        ("thresh+ds+blur", ds_blur),
        ("ds+repeat+add (no blur)", ds_repeat_add),
        ("ds+bcast+add (no blur)", ds_bcast_add),
        ("ds+MXU-up+add (no blur)", ds_mxu_add),
        ("bloom_chw full", bloom_chw),
    ):
        ms = timed(fn, hdr, n)
        print(f"{name:>24}: {ms:7.3f} ms", flush=True)


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    n = 50
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
    if "--piecewise" in sys.argv:
        main_piecewise(n)
        return
    key = jax.random.PRNGKey(0)
    hdr = jax.random.uniform(key, (H, W, 3), jnp.float32, 0.0, 2.5)

    # parity first (CPU-free: on-device compare)
    a = bloom(hdr, 1.0, 0.15)
    for name, fn in (
        ("cf", bloom_cf), ("bcast", bloom_bcast_up),
        ("cf+repeat", bloom_cf_repeat), ("flat", bloom_flat),
    ):
        b = fn(hdr, 1.0, 0.15)
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"parity {name}: max |delta| {d:.3e}", flush=True)

    for name, fn in (
        ("shipped (HWC + repeat)", bloom),
        ("radius=0 (no blur)", bloom_r0),
        ("cf blur + repeat", bloom_cf_repeat),
        ("flat-minor blur", bloom_flat),
    ):
        ms = timed(fn, hdr, n)
        print(f"{name:>24}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

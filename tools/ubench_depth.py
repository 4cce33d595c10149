"""Quick A/B timing of the depth-prepass kernel on the real chip.

Times (animate+setup+bin) and (same + rasterize_depth); the delta is the
prepass device cost.  Lean: 2 compiles, ~15 timed iters each.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.raster_pallas import bin_triangles, rasterize_depth
from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=15):
    fn = jax.jit(fn)
    s, ck = fn(state)
    int(ck)
    t0 = time.time()
    for _ in range(n):
        s, ck = fn(s)
    int(ck)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, geo = build(cfg)

    def ck32(x):
        return jnp.sum(x.astype(jnp.float32))

    def f_bin(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg)
        return s, ck32(b.idx) + ck32(b.counts)

    def f_depth(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg)
        d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
        return s, ck32(d)

    base = timed(f_bin, state)
    full = timed(f_depth, state)
    print(f"bin base : {base:7.2f} ms", flush=True)
    print(f"+depth   : {full:7.2f} ms  (prepass delta {full - base:+6.2f})", flush=True)


if __name__ == "__main__":
    main()

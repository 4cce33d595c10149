"""Stage-cost breakdown of the config-4 FUSED path (shadows+bump+bloom).

Times jitted prefixes of render_fused's composition (each stage re-runs the
previous ones — deltas are marginal costs, same methodology as
ubench_config4.py which covers the staged path).
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
from d3d12_deferred_renderer_tpu.ops.fused import render_fused
from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
    VMEM_INDIRECTION_SLOTS,
    bin_triangles,
    rasterize_depth,
)
from d3d12_deferred_renderer_tpu.ops.shadows import (
    render_shadow_map,
    shadow_visibility,
)
from d3d12_deferred_renderer_tpu.ops.transform import (
    TRI_VALID,
    setup_frame_triangles,
)
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=10):
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
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True,
        shadows=True, normal_mapping=True, bloom=True, max_lights_per_tile=128,
        shadow_vis_downsample=1,
    )
    _, state, geo = build(cfg)

    def ck32(x):
        return jnp.sum(jnp.nan_to_num(x.astype(jnp.float32), posinf=1.0,
                                      neginf=-1.0))

    def stage(upto):
        def f(s):
            s = animate(s, cfg.yaw_per_frame, cfg)
            tris, vp = setup_frame_triangles(s, cfg)
            if upto == "setup":
                return s, ck32(tris.packed)
            T = tris.packed.shape[0]
            valid = tris.packed[:, TRI_VALID] > 0.0
            binned = bin_triangles(
                tris.packed, tris.aabb, valid, cfg,
                stream_src=None if T <= VMEM_INDIRECTION_SLOTS else tris.packed,
            )
            if upto == "bin":
                return s, ck32(binned.counts) + ck32(binned.stream)
            depth_pre = rasterize_depth(tris.packed, tris.aabb, cfg, binned=binned)
            if upto == "prepass":
                return s, ck32(depth_pre)
            sd, lvp = render_shadow_map(s, cfg)
            if upto == "shadowmap":
                return s, ck32(sd)
            vis = shadow_visibility(depth_pre, vp, sd, lvp, cfg)
            if upto == "vis":
                return s, ck32(vis)
            frame = render_fused(s, cfg)  # recomputes the chain; delta = kernel+cull+post
            return s, ck32(frame)

        return f

    prev = 0.0
    for name in ("setup", "bin", "prepass", "shadowmap", "vis", "full"):
        ms = timed(stage(name), state)
        print(f"{name:>10}: {ms:7.2f} ms  (delta {ms - prev:+7.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

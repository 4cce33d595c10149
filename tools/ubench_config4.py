"""Stage-cost breakdown of the config-4 staged path (shadows+bump+bloom)."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops import post
from d3d12_deferred_renderer_tpu.ops.bump import apply_normal_mapping
from d3d12_deferred_renderer_tpu.ops.gbuffer import encode_gbuffer
from d3d12_deferred_renderer_tpu.ops.lighting import reconstruct_world_positions
from d3d12_deferred_renderer_tpu.ops.lighting_pallas import shade_pbr_tiled_pallas
from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_binned
from d3d12_deferred_renderer_tpu.ops.shadows import render_shadow_map, shadow_visibility
from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles
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
        # Raw fragment planes carry NaN on non-covered pixels (masked by the
        # real pipeline downstream) — keep the forcing checksum finite.
        return jnp.sum(jnp.nan_to_num(x.astype(jnp.float32), posinf=1.0,
                                      neginf=-1.0))

    def stage(upto):
        def f(s):
            s = animate(s, cfg.yaw_per_frame, cfg)
            tris, vp = setup_frame_triangles(s, cfg)
            frags = rasterize_binned(tris.packed, tris.aabb, cfg)
            if upto == "raster":
                return s, ck32(frags.depth) + ck32(frags.normal)
            world = reconstruct_world_positions(frags.depth, vp, cfg)
            if upto == "world":
                return s, ck32(world)
            frags = apply_normal_mapping(
                frags, world, cfg, cfg.bump_strength, cfg.bump_frequency
            )
            if upto == "bump":
                return s, ck32(frags.normal)
            gb = encode_gbuffer(frags, s.materials, cfg)
            if upto == "encode":
                return s, ck32(gb.gb0) + ck32(gb.gb1)
            sd, lvp = render_shadow_map(s, cfg)
            if upto == "shadowmap":
                return s, ck32(sd)
            vis = shadow_visibility(gb.depth, vp, sd, lvp, cfg)
            if upto == "vis":
                return s, ck32(vis)
            hdr = shade_pbr_tiled_pallas(
                gb, s.lights, cfg, vp, s.camera.eye, shadow_visibility=vis
            )
            if upto == "shade":
                return s, ck32(hdr)
            color = post.apply_post(hdr, cfg)
            frame = post.to_uint8(color)
            return s, ck32(frame)

        return f

    prev = 0.0
    for name in ("raster", "world", "bump", "encode", "shadowmap", "vis",
                 "shade", "post"):
        ms = timed(stage(name), state)
        print(f"{name:>10}: {ms:7.2f} ms  (delta {ms - prev:+7.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

"""Device-true stage profile: each pipeline prefix timed inside ONE lax.scan.

tools/profile_fused.py times prefixes with a host loop — per-dispatch tunnel
latency (~3.5 ms wall floor, CLAUDE.md) fuzzes stages cheaper than the floor.
Here each prefix runs N iterations inside a single jitted lax.scan (state
evolving every iteration, checksum-carried so nothing is dead-code-eliminated);
one dispatch per measurement makes the per-iteration time device-bound even
for sub-millisecond stages.

Usage: python tools/profile_scan.py [--config4] [--w4k] [-n 50] [--only-step]

--only-step times just the step_frame stage (the headline-row shape) — for
cheap high-n re-measures of the end-to-end number without the prefix ladder.
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
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.ops.fused import render_fused
from d3d12_deferred_renderer_tpu.ops.lighting import cull_lights_to_tiles
from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
    bin_triangles, rasterize_depth,
)
from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed_scan(body, state, n):
    """Wall time per iteration of `body` (state -> (state, ck)) inside one scan."""

    @jax.jit
    def run(s):
        def step(carry, _):
            s, acc = carry
            s2, ck = body(s)
            return (s2, acc + ck), None

        (s2, acc), _ = jax.lax.scan(step, (s, jnp.float32(0.0)), None, length=n)
        return s2, acc

    s2, acc = run(state)
    float(acc)  # warm compile + first run
    t0 = time.time()
    s2, acc = run(state)
    float(acc)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    config4 = "--config4" in sys.argv
    w4k = "--w4k" in sys.argv
    n = 50
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    if config4:
        # Match the SHIPPED config-4 flags (tools/bench_configs.py): split +
        # in-kernel cull + Mosaic resolve, so the stage attribution describes
        # the recorded row.  The prefix stages (depth prepass / XLA cull /
        # shadow map / PCF) still time the standalone ops — on the split path
        # PCF runs inside full_fused from the kernel's own depth plane
        # (bit-identical to the prepass depth), so the +pcf_vis delta remains
        # the right attribution for it.
        cfg = dataclasses.replace(
            cfg, shadows=True, normal_mapping=True, bloom=True,
            max_lights_per_tile=128,
            deferred_directional=True, inkernel_light_cull=True,
        )
    if w4k:
        cfg = dataclasses.replace(cfg, width=3840, height=2160)
    _, state, geo = build(cfg)
    if config4:
        # Same calibrated shadow tiers the recorded config-4 row runs with.
        from d3d12_deferred_renderer_tpu.calibrate import autotune_shadow

        cfg, _ = autotune_shadow(state, cfg)
    TH, TW = cfg.tile_h, cfg.tile_w

    def ck32(x):
        return jnp.sum(x.astype(jnp.float32))

    def f_animate(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        return s, ck32(s.orientation)

    def f_setup(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        return s, ck32(tris.packed) + ck32(tris.aabb)

    def f_bin(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0,
                          cfg, stream_src=tris.packed)
        return s, ck32(b.stream[:, 6]) + ck32(b.counts) + ck32(b.offs)

    def f_depth(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0,
                          cfg, stream_src=tris.packed)
        d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
        return s, ck32(d)

    def f_cull(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0,
                          cfg, stream_src=tris.packed)
        d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
        tl = cull_lights_to_tiles(
            d, s.lights, cfg, vp, tile=(TH, TW),
            max_per_tile=min(s.lights.num_point, cfg.max_live_lights_per_tile),
        )
        return s, ck32(tl.indices) + ck32(tl.counts)

    def f_full(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        return s, ck32(render_fused(s, cfg))

    def f_step(s):
        s2, frame = fr.step_frame(s, cfg)
        return s2, jnp.sum(frame.astype(jnp.uint32)).astype(jnp.float32)

    stages = [
        ("animate", f_animate), ("+setup", f_setup), ("+bin", f_bin),
        ("+depth_prepass", f_depth), ("+light_cull", f_cull),
        ("full_fused", f_full), ("step_frame", f_step),
    ]
    if not config4 and cfg.inkernel_light_cull:
        stages = stages[:3] + stages[5:]

    if config4:
        from d3d12_deferred_renderer_tpu.ops.shadows import (
            render_shadow_map, shadow_visibility,
        )

        def f_smap(s):
            s = animate(s, cfg.yaw_per_frame, cfg)
            tris, vp = setup_frame_triangles(s, cfg)
            b = bin_triangles(tris.packed, tris.aabb,
                              tris.packed[:, TRI_VALID] > 0,
                              cfg, stream_src=tris.packed)
            d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
            tl = cull_lights_to_tiles(
                d, s.lights, cfg, vp, tile=(TH, TW),
                max_per_tile=min(s.lights.num_point,
                                 cfg.max_live_lights_per_tile),
            )
            sd, lvp = render_shadow_map(s, cfg)
            return s, ck32(tl.indices) + ck32(sd)

        def f_svis(s):
            s = animate(s, cfg.yaw_per_frame, cfg)
            tris, vp = setup_frame_triangles(s, cfg)
            b = bin_triangles(tris.packed, tris.aabb,
                              tris.packed[:, TRI_VALID] > 0,
                              cfg, stream_src=tris.packed)
            d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
            tl = cull_lights_to_tiles(
                d, s.lights, cfg, vp, tile=(TH, TW),
                max_per_tile=min(s.lights.num_point,
                                 cfg.max_live_lights_per_tile),
            )
            sd, lvp = render_shadow_map(s, cfg)
            vis = shadow_visibility(d, vp, sd, lvp, cfg)
            return s, ck32(tl.indices) + ck32(vis)

        stages = stages[:5] + [
            ("+shadow_map", f_smap), ("+pcf_vis", f_svis),
        ] + stages[5:]

    if "--only-step" in sys.argv:
        stages = [("step_frame", f_step)]

    prev = 0.0
    for name, fn in stages:
        ms = timed_scan(fn, state, n)
        print(f"{name:>16}: {ms:7.3f} ms  (delta {ms - prev:+7.3f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

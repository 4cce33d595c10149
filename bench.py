"""Benchmark harness: 1080p deferred frame, multi-mesh scene, 256 point lights,
per-tile light culling (BASELINE.json config 3) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is FPS / 60 — the reference publishes no numbers (BASELINE.md), so the
driver's >60 FPS target is the baseline.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import numpy as np


def build(cfg, n_meshes=24, n_lights=256):
    import d3d12_deferred_renderer_tpu as dxr

    meshes = dxr.procedural.benchmark_meshes(n=n_meshes)
    geo = dxr.build_scene_geometry(meshes)
    lights = dxr.random_point_lights(n_lights, cfg=cfg)
    state = dxr.make_scene(
        geo, cfg, lights=lights, placement="grid",
        materials=dxr.Materials.varied(geo.num_meshes),
    )
    return dxr, state, geo


def main():
    import d3d12_deferred_renderer_tpu as dxr
    from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

    enable_compilation_cache()

    on_tpu = jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG,
        use_pallas=on_tpu,
        fused=on_tpu,  # fused tiled-deferred mono-kernel (G-buffer VMEM-only)
        # CPU fallback (no TPU available): tiny frame so the harness still runs.
        **({} if on_tpu else {"width": 256, "height": 144}),
    )
    # The CPU fallback exists only so the harness runs without a TPU; the
    # scan-based reference rasterizer is slow there, so shrink the scene.
    dxr, state, geo = build(cfg, **({} if on_tpu else {"n_meshes": 2, "n_lights": 16}))

    # Warm up / compile.
    state, frame = dxr.step_frame_jit(state, cfg)
    frame.block_until_ready()

    n = 60 if on_tpu else 3
    t0 = time.time()
    for _ in range(n):
        state, frame = dxr.step_frame_jit(state, cfg)
    frame.block_until_ready()
    dt = (time.time() - t0) / n

    fps = 1.0 / dt
    mpix = cfg.width * cfg.height * fps / 1e6

    # Per-pass breakdown (the BASELINE metric names "G-buffer+lighting ms/frame").
    import jax as _jax
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles
    from d3d12_deferred_renderer_tpu.frame import _rasterize
    from d3d12_deferred_renderer_tpu.ops.gbuffer import encode_gbuffer
    from d3d12_deferred_renderer_tpu.ops.lighting import shade_pbr_tiled
    from d3d12_deferred_renderer_tpu.ops import post as _post

    def gbuffer_pass(s):
        tris, vp = setup_frame_triangles(s, cfg)
        frags = _rasterize(tris.packed, cfg, tris.aabb)
        return encode_gbuffer(frags, s.materials, cfg), vp

    def lighting_pass(gb, s, vp):
        hdr = shade_pbr_tiled(gb, s.lights, cfg, vp, s.camera.eye)
        return _post.to_uint8(_post.apply_post(hdr, cfg))

    gb_j = _jax.jit(gbuffer_pass)
    li_j = _jax.jit(lighting_pass)
    gb, vp = gb_j(state)
    img = li_j(gb, state, vp)
    _jax.block_until_ready((gb, img))
    reps = 30 if on_tpu else 2
    t0 = time.time()
    for _ in range(reps):
        gb, vp = gb_j(state)
    _jax.block_until_ready(gb)
    gb_ms = (time.time() - t0) / reps * 1e3
    t0 = time.time()
    for _ in range(reps):
        img = li_j(gb, state, vp)
    img.block_until_ready()
    li_ms = (time.time() - t0) / reps * 1e3
    result = {
        "metric": "1080p_fps_256_lights" if on_tpu else "cpu_fallback_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
        "detail": {
            "resolution": f"{cfg.width}x{cfg.height}",
            "lights": state.lights.num_point,
            "triangles": geo.num_triangles,
            "ms_per_frame": round(dt * 1e3, 3),
            "gbuffer_ms": round(gb_ms, 3),
            "lighting_ms": round(li_ms, 3),
            "mpix_shaded_per_sec": round(mpix, 1),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

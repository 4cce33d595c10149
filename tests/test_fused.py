"""Fused tiled-deferred mono-kernel: equivalence with the staged pipeline."""
import dataclasses
import os

import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.fused import cull_lights_frustum, render_fused
from d3d12_deferred_renderer_tpu.frame import render

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _scene(cfg, n_lights=24):
    meshes = dxr.procedural.benchmark_meshes(n=4, rings=8, segments=16)
    geo = dxr.build_scene_geometry(meshes)
    lights = dxr.random_point_lights(n_lights, cfg=cfg)
    state = dxr.make_scene(
        geo, cfg, lights=lights, placement="grid",
        materials=dxr.Materials.varied(geo.num_meshes),
    )
    return dxr.animate(state, cfg.yaw_per_frame, cfg)


def test_fused_matches_staged():
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, fused=False, max_tris_per_tile=2048,
    )
    state = _scene(cfg)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


def test_fused_no_point_lights():
    cfg = dxr.RendererConfig(
        width=128, height=32, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
    )
    state = _scene(cfg, n_lights=0)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    assert np.abs(staged - fused).max() <= 1


def test_fused_tonemap_none():
    cfg = dxr.RendererConfig(
        width=128, height=32, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, tonemap="none", max_tris_per_tile=2048,
    )
    state = _scene(cfg, n_lights=8)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    assert np.abs(staged - fused).max() <= 1


def test_fused_dense_lights_no_truncation():
    """Light density far beyond any per-tile cap: the fused kernel's in-kernel
    culling has NO cap (SMEM list holds all L lights), so it must still match the
    staged path run with a truncation-free cap."""
    cfg = dxr.RendererConfig(
        width=128, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        max_lights_per_tile=96,  # == n_lights: staged path cannot truncate
    )
    state = _scene(cfg, n_lights=96)
    # Big radii so most lights hit most tiles (the overflow regime).
    import dataclasses as _dc
    lights = _dc.replace(state.lights, point_radius=state.lights.point_radius * 3.0)
    state = _dc.replace(state, lights=lights)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_frustum_culling_is_superset_of_depth_aware():
    """Full-depth frustum culling may keep more lights, never fewer relevant ones:
    every light kept by the depth-aware culling for a geometry tile must also be
    kept by the frustum culling."""
    import jax.numpy as jnp
    from d3d12_deferred_renderer_tpu.ops.lighting import cull_lights_to_tiles
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles
    from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed

    cfg = dxr.RendererConfig(width=256, height=64, tile_h=32, tile_w=32,
                             shading="pbr", use_pallas=False)
    state = _scene(cfg, n_lights=16)
    tris, vp = setup_frame_triangles(state, cfg)
    frags = rasterize_packed(tris.packed, cfg.height, cfg.width)

    depth_aware = cull_lights_to_tiles(frags.depth, state.lights, cfg, vp, tile=32)
    fr_idx, fr_counts, fr_overflow = cull_lights_frustum(
        state.lights, cfg, vp, 32, 32, cfg.max_lights_per_tile
    )
    assert int(fr_overflow) == 0
    da_idx = np.asarray(depth_aware.indices).reshape(-1, depth_aware.indices.shape[-1])
    da_cnt = np.asarray(depth_aware.counts).reshape(-1)
    fr_idx = np.asarray(fr_idx)
    fr_cnt = np.asarray(fr_counts)
    for t in range(da_idx.shape[0]):
        kept_da = set(da_idx[t, : da_cnt[t]].tolist())
        kept_fr = set(fr_idx[t, : fr_cnt[t]].tolist())
        assert kept_da <= kept_fr, f"tile {t}: {kept_da - kept_fr} missing"

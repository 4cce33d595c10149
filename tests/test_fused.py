"""Fused tiled-deferred mono-kernel: equivalence with the staged pipeline."""
import dataclasses
import os

import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.fused import render_fused
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


def test_fused_stream_db_bit_identical(monkeypatch):
    """stream_dma_db on the fused mono-kernel's streamed path: same rows land
    at the same fetch offsets, so the frame must be BIT-identical."""
    from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "VMEM_INDIRECTION_SLOTS", 0)  # force streamed path
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, fused=False, max_tris_per_tile=2048,
    )
    state = _scene(cfg)
    single = np.asarray(render_fused(state, cfg, interpret=True))
    cfg_db = dataclasses.replace(cfg, stream_dma_db=True)
    double = np.asarray(render_fused(state, cfg_db, interpret=True))
    np.testing.assert_array_equal(single, double)


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


def test_fused_fxaa_matches_staged():
    """FXAA must run in the staged slot (gamma-encoded float, BEFORE uint8
    quantization) on the fused path too — filtering the quantized frame
    diverges on edges."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, fused=False, fxaa=True,
        max_tris_per_tile=2048,
    )
    state = _scene(cfg)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.01


def test_fused_dense_lights_no_truncation():
    """Light density far beyond realistic per-tile counts: with the live-light
    list cap sized to the light count neither path truncates, so the fused
    kernel must still match the staged path exactly (an undersized cap is a
    LOUD overflow, tested in test_frame's overflow-signal test)."""
    cfg = dxr.RendererConfig(
        width=128, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        max_lights_per_tile=96,       # == n_lights: staged path cannot truncate
        max_live_lights_per_tile=96,  # == n_lights: fused list cannot truncate
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


def test_fine_grid_culling_keeps_all_contributing_lights():
    """cull_lights_to_tiles on the Pallas kernels' rectangular (tile_h, tile_w)
    grid — the exact cull the fused path uses via its depth prepass — must keep
    every light that reaches (distance < radius) any covered pixel of a tile."""
    from d3d12_deferred_renderer_tpu.ops.lighting import (
        cull_lights_to_tiles,
        reconstruct_world_positions,
    )
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles
    from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed

    cfg = dxr.RendererConfig(width=256, height=64, tile_h=8, tile_w=128,
                             shading="pbr", use_pallas=False,
                             max_tris_per_tile=2048)
    state = _scene(cfg, n_lights=16)
    tris, vp = setup_frame_triangles(state, cfg)
    frags = rasterize_packed(tris.packed, cfg.height, cfg.width)

    L = state.lights.num_point
    tl = cull_lights_to_tiles(
        frags.depth, state.lights, cfg, vp,
        tile=(cfg.tile_h, cfg.tile_w), max_per_tile=L,
    )
    nty, ntx = cfg.height // cfg.tile_h, cfg.width // cfg.tile_w
    bn_idx = np.asarray(tl.indices).reshape(nty * ntx, -1)
    bn_cnt = np.asarray(tl.counts).reshape(-1)
    assert int(tl.overflow) == 0

    depth = np.asarray(frags.depth)
    pos = np.asarray(state.lights.point_position)
    rad = np.asarray(state.lights.point_radius)
    world = np.asarray(reconstruct_world_positions(frags.depth, vp, cfg))
    covered = depth < 1.0
    TH, TW = cfg.tile_h, cfg.tile_w
    for tyi in range(nty):
        for txi in range(ntx):
            t = tyi * ntx + txi
            kept = set(bn_idx[t, : bn_cnt[t]].tolist())
            sl = (slice(tyi * TH, (tyi + 1) * TH), slice(txi * TW, (txi + 1) * TW))
            if not covered[sl].any():
                assert bn_cnt[t] == 0  # empty tiles cull everything
                continue
            wpix = world[sl][covered[sl]]  # [n, 3]
            for li in range(pos.shape[0]):
                d = np.linalg.norm(wpix - pos[li], axis=-1)
                if (d < rad[li]).any():  # light contributes somewhere in tile
                    assert li in kept, f"tile {t} missing contributing light {li}"


def test_depth_prepass_bit_identical():
    """rasterize_depth (the light-cull prepass / shadow rasterizer) must produce
    the EXACT depth plane of the full rasterizer and the XLA oracle."""
    from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp
    from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles
    from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed

    cfg = dxr.RendererConfig(width=256, height=64, tile_h=8, tile_w=128,
                             shading="pbr", use_pallas=False,
                             max_tris_per_tile=2048)
    state = _scene(cfg)
    tris, _ = setup_frame_triangles(state, cfg)
    dep = np.asarray(rp.rasterize_depth(tris.packed, tris.aabb, cfg, interpret=True))
    full = np.asarray(
        rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True).depth
    )
    ref = np.asarray(rasterize_packed(tris.packed, cfg.height, cfg.width).depth)
    np.testing.assert_array_equal(dep, full)
    np.testing.assert_array_equal(dep, ref)


def test_fused_config4_matches_staged():
    """The full config-4 feature stack (shadows + procedural bump + bloom) on
    the fused path: shadow visibility enters the kernel as an input plane,
    bump runs in-kernel on tile-block derivatives, bloom forces linear-HDR
    kernel output with XLA post outside.  Must match the staged XLA path
    within 1 u8 LSB (same contract as the plain PBR configs)."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        shadows=True, shadow_map_size=128,
        normal_mapping=True, bloom=True,
    )
    state = _scene(cfg)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    assert (diff > 0).mean() < 0.02


def test_fused_shadows_only_matches_staged():
    """Shadows without bump/bloom: the vis plane alone (tonemap+gamma stay
    in-kernel)."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        shadows=True, shadow_map_size=128,
    )
    state = _scene(cfg)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_fused_bump_only_matches_staged():
    """In-kernel tile-block bump vs the staged XLA block implementation."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        normal_mapping=True,
    )
    state = _scene(cfg)
    staged = np.asarray(render(state, cfg)).astype(int)
    fused = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    diff = np.abs(staged - fused)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_fused_inkernel_cull_matches_prepass_cull():
    """In-kernel light culling (cfg.inkernel_light_cull): the mono-kernel
    culls + compacts the light set from its own rastered depth instead of
    consuming XLA per-tile lists fed by the depth prepass.  Both culls are
    exact-conservative supersets of the contributing lights (the falloff
    window is zero at the culling radius) and both compact ids ascending, so
    the only permitted divergence is sub-LSB accumulation reassociation from
    different chunk partitions — in practice bit-identical on this scene."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        max_lights_per_tile=32, max_live_lights_per_tile=24,
    )
    state = _scene(cfg)
    base, ov_b = render_fused(state, cfg, interpret=True, return_overflow=True)
    ik, ov_k = render_fused(
        state, dataclasses.replace(cfg, inkernel_light_cull=True),
        interpret=True, return_overflow=True,
    )
    assert int(ov_b) == 0 and int(ov_k) == 0
    diff = np.abs(np.asarray(base).astype(int) - np.asarray(ik).astype(int))
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"
    # And against the staged XLA oracle (same contract as the other configs).
    staged = np.asarray(render(state, cfg)).astype(int)
    diff_s = np.abs(staged - np.asarray(ik).astype(int))
    assert diff_s.max() <= 1, f"max u8 diff vs staged {diff_s.max()}"


def test_fused_inkernel_cull_config4():
    """The full feature stack with in-kernel culling: shadows still render
    the depth prepass (PCF visibility needs it) but the XLA tile cull and
    per-tile list DMA drop out."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        shadows=True, shadow_map_size=128, normal_mapping=True, bloom=True,
        max_lights_per_tile=32, max_live_lights_per_tile=24,
    )
    state = _scene(cfg)
    base = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    ik = np.asarray(render_fused(
        state, dataclasses.replace(cfg, inkernel_light_cull=True),
        interpret=True,
    )).astype(int)
    diff = np.abs(base - ik)
    assert diff.max() <= 1, f"max u8 diff {diff.max()}"


def test_fused_deferred_directional_matches():
    """Deferred-directional split (cfg.deferred_directional): the kernel skips
    the directional term and emits depth/normal/mesh-id planes; XLA computes
    PCF visibility from the KERNEL depth (bit-identical to the prepass depth)
    and adds vis * directional via the staged path's GGX.  Combined with the
    in-kernel cull nothing consumes the prepass, so the shadow frame drops it
    entirely.  Only reassociation (directional added last instead of first)
    may move the result — bounded at 1 u8 LSB vs both oracles."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        shadows=True, shadow_map_size=128, normal_mapping=True, bloom=True,
        max_lights_per_tile=32, max_live_lights_per_tile=24,
    )
    state = _scene(cfg)
    base = np.asarray(render_fused(state, cfg, interpret=True)).astype(int)
    sp_cfg = dataclasses.replace(
        cfg, deferred_directional=True, inkernel_light_cull=True
    )
    sp, ov = render_fused(state, sp_cfg, interpret=True, return_overflow=True)
    assert int(ov) == 0
    sp = np.asarray(sp).astype(int)
    assert np.abs(base - sp).max() <= 1
    staged = np.asarray(render(state, cfg)).astype(int)
    assert np.abs(staged - sp).max() <= 1
    # The Mosaic resolve kernel (split_resolve_pallas, the default above) must
    # match the XLA resolve block (the oracle) to 1 LSB — same math, only
    # association/fusion may differ.
    sp_xla = np.asarray(render_fused(
        state, dataclasses.replace(sp_cfg, split_resolve_pallas=False),
        interpret=True,
    )).astype(int)
    assert np.abs(sp_xla - sp).max() <= 1

    # Sparse PCF with the lit-facing tile pruning (split passes lit_mask):
    # pruned pixels take vis = 1.0 but their directional term is zero, so the
    # FRAME is bit-identical to the dense-PCF split render.
    sp_sparse = np.asarray(render_fused(
        state, dataclasses.replace(sp_cfg, shadow_tiles_cap=-1),
        interpret=True,
    )).astype(int)
    np.testing.assert_array_equal(sp_sparse, sp)

    # Without bloom the split forces linear-HDR out and the XLA side finishes
    # tonemap/gamma AFTER the directional add — same bound.
    cfg_nb = dataclasses.replace(cfg, bloom=False)
    b2 = np.asarray(render_fused(state, cfg_nb, interpret=True)).astype(int)
    s2 = np.asarray(render_fused(
        state, dataclasses.replace(cfg_nb, deferred_directional=True),
        interpret=True,
    )).astype(int)
    assert np.abs(b2 - s2).max() <= 1


def test_fused_inkernel_cull_overflow_is_loud():
    """More live lights than max_live_lights_per_tile must raise the overflow
    counter (never a silently under-shaded tile) — same loud contract as the
    XLA lists."""
    cfg = dxr.RendererConfig(
        width=256, height=64, tile_h=8, tile_w=128,
        shading="pbr", use_pallas=False, max_tris_per_tile=2048,
        max_lights_per_tile=32, max_live_lights_per_tile=8,
        inkernel_light_cull=True,
    )
    # Radius 50 reaches every tile from anywhere: all 24 lights live per
    # covered tile, far beyond the 8 compaction slots.
    meshes = dxr.procedural.benchmark_meshes(n=4, rings=8, segments=16)
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(
        geo, cfg, lights=dxr.random_point_lights(24, cfg=cfg, radius=50.0),
        placement="grid", materials=dxr.Materials.varied(geo.num_meshes),
    )
    _, overflow = render_fused(state, cfg, interpret=True, return_overflow=True)
    assert int(overflow) > 0

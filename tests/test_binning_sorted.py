"""Sort-based (tile, triangle)-pair binning must bin identically to the flat
overlap-matrix oracle — same tiles, same per-tile triangle order (submission
order, the depth-LESS first-wins requirement)."""
import dataclasses

import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed
from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles


def _scene_tris(cfg, n=4):
    meshes = dxr.procedural.benchmark_meshes(n=n, rings=10, segments=20)
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(geo, cfg, placement="grid")
    state = dxr.animate(state)
    return setup_frame_triangles(state, cfg)[0]


def _assert_live_slots_equal(a, b):
    """Slots beyond each tile's count are padding (never read by the kernel);
    compare only the live prefix of the triangle-id lists."""
    ca, cb = np.asarray(a.counts)[:, 0], np.asarray(b.counts)[:, 0]
    np.testing.assert_array_equal(ca, cb)
    ia, ib = np.asarray(a.idx), np.asarray(b.idx)
    for t in range(ia.shape[0]):
        np.testing.assert_array_equal(ia[t, : ca[t]], ib[t, : ca[t]])


def _force_sorted(monkeypatch):
    monkeypatch.setattr(rp, "FLAT_CELLS", 0)


def test_sorted_matches_flat(monkeypatch):
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=128)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0

    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(srt, flat)
    assert int(srt.overflow) == int(flat.overflow)


@pytest.mark.parametrize("expand,max_big", [(1, 4096), (4, 2048), (64, 1)])
def test_sorted_matches_flat_across_expansion_budgets(monkeypatch, expand, max_big):
    """Any (bin_expand, bin_max_big) split must produce identical binning as long
    as nothing exceeds the big budget — small/big is an internal routing choice.
    (expand=64 exceeds the 32-tile grid, so max_big=1 is never consumed.)"""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=128,
                         bin_expand=expand, bin_max_big=max_big)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(srt.overflow) == 0
    _assert_live_slots_equal(srt, flat)


def test_sorted_raster_matches_reference(monkeypatch):
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=512)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0
    _force_sorted(monkeypatch)
    # No overflow at this cap — otherwise the comparison is vacuous.
    binned = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(binned.overflow) == 0
    pal = rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    ref = rasterize_packed(tris.packed, cfg.height, cfg.width)
    np.testing.assert_array_equal(np.asarray(pal.mesh_id), np.asarray(ref.mesh_id))
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), atol=1e-6)


def test_overflow_reported(monkeypatch):
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=8)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    assert int(flat.overflow) > 0
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(srt.overflow) == int(flat.overflow)


def test_sorted_matches_flat_all_four_tiers(monkeypatch):
    """Tier thresholds squeezed so small/medium/large/big are ALL populated on
    the same scene — routing across every tier must still reproduce the flat
    oracle exactly (tiles, order, overflow)."""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=256,
                         bin_expand=1, bin_expand_medium=2, bin_max_medium=512,
                         bin_expand_large=8, bin_max_large=128, bin_max_big=64)
    tris = _scene_tris(cfg, n=4)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(srt, flat)
    assert int(srt.overflow) == int(flat.overflow)


def test_big_budget_overflow_reported(monkeypatch):
    """More wide triangles than the expansion-tier budgets: loud overflow,
    no silent holes."""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=256, bin_expand=1,
                         bin_expand_medium=1, bin_max_medium=1, bin_max_big=1)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(srt.overflow) > 0


def test_small_budget_parity_when_ample(monkeypatch):
    """A positive bin_max_small large enough to hold every small-tier triangle
    routes through the compacted small tier (LS < T) and must still reproduce
    the flat oracle exactly — the path FLAGSHIP_CONFIG ships (12288) and the
    shadow pass derives."""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=256, bin_max_small=1280)
    tris = _scene_tris(cfg, n=4)
    assert tris.packed.shape[0] > 1280, "budget must actually compact (LS < T)"
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(srt, flat)
    assert int(srt.overflow) == int(flat.overflow) == 0


def test_small_budget_overflow_reported(monkeypatch):
    """More small-footprint triangles than bin_max_small: the excess is
    reported via the loud overflow counter, never silently dropped."""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=256, bin_max_small=8)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(srt.overflow) > 0


def test_sorted_nonaligned_grid(monkeypatch):
    """Frame size not divisible by the tile size: border tiles must bin right."""
    cfg = RendererConfig(width=200, height=88, tile_h=8, tile_w=128,
                         max_tris_per_tile=64)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(tris.packed, tris.aabb, valid, cfg)
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(srt, flat)


def test_sorted_band_offset(monkeypatch):
    """Banded binning (y_offset/band_h, the multi-chip path) matches flat."""
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=128)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles_flat(
        tris.packed, tris.aabb, valid, cfg, band_h=64, y_offset=64
    )
    _force_sorted(monkeypatch)
    srt = rp.bin_triangles(
        tris.packed, tris.aabb, valid, cfg, band_h=64, y_offset=64
    )
    _assert_live_slots_equal(srt, flat)

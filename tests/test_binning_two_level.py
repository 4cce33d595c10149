"""Two-level (coarse->fine) binning must bin identically to the flat path."""
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


def test_two_level_matches_flat(monkeypatch):
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=128)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0

    flat = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    monkeypatch.setattr(rp, "TWO_LEVEL_CELLS", 1)
    monkeypatch.setattr(rp, "COARSE_GROUP", (4, 2))
    two = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(two, flat)


def test_two_level_raster_matches_reference(monkeypatch):
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=512)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0
    monkeypatch.setattr(rp, "TWO_LEVEL_CELLS", 1)
    monkeypatch.setattr(rp, "COARSE_GROUP", (4, 2))
    # No overflow at this cap — otherwise the comparison is vacuous.
    binned = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(binned.overflow) == 0
    pal = rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    ref = rasterize_packed(tris.packed, cfg.height, cfg.width)
    np.testing.assert_array_equal(np.asarray(pal.mesh_id), np.asarray(ref.mesh_id))
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), atol=1e-6)


def test_overflow_reported():
    cfg = RendererConfig(width=256, height=128, tile_h=8, tile_w=128,
                         max_tris_per_tile=8)
    tris = _scene_tris(cfg)
    valid = tris.packed[:, TRI_VALID] > 0
    binned = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    assert int(binned.overflow) > 0


def test_two_level_nonaligned_coarse_grid(monkeypatch):
    """Fine grid not divisible by the coarse group: padding tiles must crop."""
    cfg = RendererConfig(width=200, height=88, tile_h=8, tile_w=128,
                         max_tris_per_tile=64)
    tris = _scene_tris(cfg, n=2)
    valid = tris.packed[:, TRI_VALID] > 0
    flat = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    monkeypatch.setattr(rp, "TWO_LEVEL_CELLS", 1)
    monkeypatch.setattr(rp, "COARSE_GROUP", (4, 2))
    two = rp.bin_triangles(tris.packed, tris.aabb, valid, cfg)
    _assert_live_slots_equal(two, flat)

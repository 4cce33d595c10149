"""Pallas tile-binned rasterizer: exact agreement with the reference rasterizer
(interpret mode on CPU), plus binning unit tests."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
    bin_triangles,
    rasterize_binned,
)
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed
from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def scene_tris(cfg, meshes=("cube", "pyramid")):
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, f"{m}.obj"), prefer_native=False) for m in meshes]
    )
    state = dxr.make_scene(geo, cfg)
    state = dxr.animate(state)
    return setup_frame_triangles(state, cfg)[0]


def test_binning_counts_and_order():
    cfg = RendererConfig(width=256, height=64, tile_h=8, tile_w=128,
                         max_tris_per_tile=32)
    tris = scene_tris(cfg)
    binned = bin_triangles(
        tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg
    )
    counts = np.asarray(binned.counts)[:, 0]
    assert counts.sum() > 0
    assert counts.max() <= 32
    # K = min(max_tris_per_tile, T'); T' = 2 * 18 post-near-clip slots.
    T2 = tris.packed.shape[0]
    assert T2 == 36
    assert binned.idx.shape == (8 * 2, min(32, T2))
    # the compacted stream pads record rows to one full 128-float lane tile
    # (contiguous DMA blocks) and carries NT+1 segment offsets
    st = binned.with_stream(tris.packed, cap=64, slack=16)
    assert st.stream.shape == (64 + 16, 128)
    assert st.offs.shape == (8 * 2 + 1,)


def test_pallas_matches_reference_scene():
    cfg = RendererConfig(width=256, height=64, tile_h=8, tile_w=128)
    tris = scene_tris(cfg)
    ref = rasterize_packed(tris.packed, cfg.height, cfg.width)
    pal = rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal.mesh_id), np.asarray(ref.mesh_id))
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal.normal), np.asarray(ref.normal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal.uv), np.asarray(ref.uv), atol=1e-5)


def test_pallas_matches_reference_nondivisible_screen():
    """Screen size not divisible by the tile size: padded tiles must crop away."""
    cfg = RendererConfig(width=200, height=52, tile_h=8, tile_w=128)
    tris = scene_tris(cfg)
    ref = rasterize_packed(tris.packed, cfg.height, cfg.width)
    pal = rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    assert pal.depth.shape == (52, 200)
    np.testing.assert_array_equal(np.asarray(pal.mesh_id), np.asarray(ref.mesh_id))
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), atol=1e-6)


def test_pallas_depth_order_parity():
    """Submission order must be preserved through binning (depth-equal first wins)."""
    import tests.test_raster as tr

    a = {"xy": [(0, 0), (64, 0), (0, 32)], "z": [0.5] * 3, "mesh_id": 1}
    b = {"xy": [(0, 0), (64, 0), (0, 32)], "z": [0.5] * 3, "mesh_id": 2}
    packed = tr.make_packed([a, b])
    aabb = jnp.asarray([[0, 0, 64, 32], [0, 0, 64, 32]], jnp.float32)
    cfg = RendererConfig(width=128, height=32, tile_h=8, tile_w=128)
    pal = rasterize_binned(packed, aabb, cfg, interpret=True)
    mid = np.asarray(pal.mesh_id)
    assert (mid[mid >= 0] == 1).all()


def test_gathered_records_path_matches_indirect(monkeypatch):
    """Both kernel variants (VMEM-resident indirection vs pre-gathered records)
    must produce identical output."""
    from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp

    cfg = RendererConfig(width=256, height=64, tile_h=8, tile_w=128)
    tris = scene_tris(cfg)
    indirect = rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    monkeypatch.setattr(rp, "VMEM_INDIRECTION_SLOTS", 0)  # force gathered path
    gathered = rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(indirect.mesh_id), np.asarray(gathered.mesh_id)
    )
    np.testing.assert_array_equal(
        np.asarray(indirect.depth), np.asarray(gathered.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(indirect.normal), np.asarray(gathered.normal)
    )


def test_stream_db_prefetch_matches_single_buffer(monkeypatch):
    """Double-buffered segment DMA (stream_dma_db) is bit-identical to the
    single-buffer ladder on both streamed kernels (full raster + depth-only)."""
    from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp

    cfg = RendererConfig(width=256, height=64, tile_h=8, tile_w=128)
    tris = scene_tris(cfg)
    monkeypatch.setattr(rp, "VMEM_INDIRECTION_SLOTS", 0)  # force streamed path
    single = rp.rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    d_single = rp.rasterize_depth(tris.packed, tris.aabb, cfg, interpret=True)
    cfg_db = dataclasses.replace(cfg, stream_dma_db=True)
    double = rp.rasterize_binned(tris.packed, tris.aabb, cfg_db, interpret=True)
    d_double = rp.rasterize_depth(tris.packed, tris.aabb, cfg_db, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(single.mesh_id), np.asarray(double.mesh_id)
    )
    np.testing.assert_array_equal(
        np.asarray(single.depth), np.asarray(double.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(single.normal), np.asarray(double.normal)
    )
    np.testing.assert_array_equal(np.asarray(d_single), np.asarray(d_double))


def test_pallas_full_frame_golden_equivalence():
    """Full frame program with the pallas rasterizer forced on (interpret) equals
    the pure-XLA frame."""
    cfg = RendererConfig(width=160, height=96, use_pallas=False)
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    state = dxr.make_scene(geo, cfg)
    state = dxr.animate(state)

    from d3d12_deferred_renderer_tpu.frame import render
    from d3d12_deferred_renderer_tpu.ops import gbuffer as gbm
    from d3d12_deferred_renderer_tpu.ops.lighting import shade_lambert
    from d3d12_deferred_renderer_tpu.ops import post

    ref_frame = np.asarray(render(state, cfg))

    tris, _ = setup_frame_triangles(state, cfg)
    frags = rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    gb = gbm.encode_gbuffer(frags, state.materials, cfg)
    color = shade_lambert(gb, state.lights, cfg)
    pal_frame = np.asarray(post.to_uint8(color))
    np.testing.assert_array_equal(pal_frame, ref_frame)

"""TPU (Mosaic) lowerability of every Pallas program, checked on CPU.

`jax.export` with platforms=["tpu"] runs the full JAX->Mosaic kernel lowering
without needing a device — it catches unsupported ops, bad block shapes, and
layout violations that interpret-mode tests (which never lower to Mosaic)
cannot.  The real-chip compile (Mosaic MLIR -> machine code) still only happens
on hardware, but historically almost every "works in interpret, breaks on TPU"
failure is a lowering error this test now pins.

Each case exports a small-but-representative program; sizes are kept tiny
because export still traces the whole frame graph.
"""
import dataclasses

import jax
import pytest
from jax import export

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import xmath
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.transform import camera_matrices


def _scene(cfg, n=2, lights=8):
    geo = dxr.build_scene_geometry(dxr.procedural.benchmark_meshes(n=n, rings=6, segments=10))
    return dxr.make_scene(
        geo, cfg, lights=dxr.random_point_lights(lights, cfg=cfg),
        placement="grid", materials=dxr.Materials.varied(geo.num_meshes),
    )


def _lowers(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module()) > 0


def test_setup_kernel_lowers():
    cfg = RendererConfig(width=256, height=128, setup_pallas=True)
    state = _scene(cfg)
    from d3d12_deferred_renderer_tpu.ops.setup_pallas import setup_triangles_pallas

    def f(state):
        model = xmath.model_matrix(state.position, state.orientation, state.scale)
        view, proj = camera_matrices(state, cfg)
        mvp = model @ (view @ proj)
        tris = setup_triangles_pallas(state.geometry, mvp, model, cfg)
        return tris.packed, tris.aabb

    _lowers(f, state)

    def fd(state):
        model = xmath.model_matrix(state.position, state.orientation, state.scale)
        view, proj = camera_matrices(state, cfg)
        tris = setup_triangles_pallas(
            state.geometry, model @ (view @ proj), model, cfg,
            cull="none", attrs=False,
        )
        return tris.packed

    _lowers(fd, state)


def test_raster_kernels_lower():
    cfg = RendererConfig(width=256, height=64, shading="pbr", use_pallas=True)
    state = _scene(cfg)
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
        rasterize_binned,
        rasterize_depth,
    )
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles

    def f(state):
        tris, _ = setup_frame_triangles(state, cfg)
        frags = rasterize_binned(tris.packed, tris.aabb, cfg)
        depth = rasterize_depth(tris.packed, tris.aabb, cfg)
        return frags.depth, depth

    _lowers(f, state)


def test_fused_and_lighting_kernels_lower():
    # The fused path gates on jax.default_backend() == "tpu"; export the
    # kernel entry points directly.
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, width=256, height=64, use_pallas=True, fused=True,
        shadows=True, normal_mapping=True, bloom=True,
        max_lights_per_tile=32, max_live_lights_per_tile=16,
        shadow_map_size=128, shadow_tiles_cap=0,
        inkernel_light_cull=False,  # pin the prefetch-list variant here
    )
    state = _scene(cfg, lights=8)
    from d3d12_deferred_renderer_tpu.ops.fused import render_fused

    def f(state):
        return render_fused(state, cfg)

    _lowers(f, state)

    from d3d12_deferred_renderer_tpu.ops.gbuffer import encode_gbuffer
    from d3d12_deferred_renderer_tpu.ops.lighting_pallas import (
        shade_pbr_tiled_pallas,
    )
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_binned
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles

    def g(state):
        tris, vp = setup_frame_triangles(state, cfg)
        frags = rasterize_binned(tris.packed, tris.aabb, cfg)
        gb = encode_gbuffer(frags, state.materials, cfg)
        return shade_pbr_tiled_pallas(
            gb, state.lights, cfg, vp, state.camera.eye
        )

    _lowers(g, state)


def test_fused_inkernel_cull_lowers():
    # The in-kernel light-cull variant adds MXU rank compaction, SMEM overflow
    # output, and the transposed light-param rows — a distinct Mosaic program
    # from the prefetch-list kernel.  Export both the no-shadow shape (prepass
    # + XLA cull fully deleted) and the config-4 shape (prepass stays for PCF).
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, width=256, height=64, use_pallas=True, fused=True,
        inkernel_light_cull=True,
        max_lights_per_tile=32, max_live_lights_per_tile=16,
    )
    state = _scene(cfg, lights=8)
    from d3d12_deferred_renderer_tpu.ops.fused import render_fused

    def f(state):
        return render_fused(state, cfg)

    _lowers(f, state)

    cfg4 = dataclasses.replace(
        cfg, shadows=True, normal_mapping=True, bloom=True,
        shadow_map_size=128, shadow_tiles_cap=0,
    )

    def g(state):
        return render_fused(state, cfg4)

    _lowers(g, state)

    # Deferred-directional split: the aux_out kernel variant (8-plane output,
    # no directional term, no vis input) + the XLA directional add.
    cfg_sp = dataclasses.replace(cfg4, deferred_directional=True)

    def h(state):
        return render_fused(state, cfg_sp)

    _lowers(h, state)


def test_stream_db_kernels_lower(monkeypatch):
    # Double-buffered segment DMA (stream_dma_db): dynamic slot offsets into
    # the doubled scratch and dynamic indexing of the (2,) DMA-semaphore array
    # are Mosaic features interpret mode cannot vouch for — export all three
    # streamed kernels (full raster, depth-only, fused mono-kernel) with the
    # flag on.
    from d3d12_deferred_renderer_tpu.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "VMEM_INDIRECTION_SLOTS", 0)  # force streamed path
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, width=256, height=64, use_pallas=True, fused=True,
        stream_dma_db=True, max_lights_per_tile=32, max_live_lights_per_tile=16,
    )
    state = _scene(cfg, lights=8)
    from d3d12_deferred_renderer_tpu.ops.fused import render_fused
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles

    def f(state):
        tris, _ = setup_frame_triangles(state, cfg)
        frags = rp.rasterize_binned(tris.packed, tris.aabb, cfg)
        depth = rp.rasterize_depth(tris.packed, tris.aabb, cfg)
        return frags.depth, depth, render_fused(state, cfg)

    _lowers(f, state)


def test_bump_kernel_lowers():
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, width=256, height=64, use_pallas=True,
        normal_mapping=True, shading="pbr",
    )
    state = _scene(cfg)
    from d3d12_deferred_renderer_tpu.ops.bump import apply_normal_mapping
    from d3d12_deferred_renderer_tpu.ops.lighting import (
        reconstruct_world_positions,
    )
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_binned
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles

    def f(state):
        tris, vp = setup_frame_triangles(state, cfg)
        frags = rasterize_binned(tris.packed, tris.aabb, cfg)
        world = reconstruct_world_positions(frags.depth, vp, cfg)
        frags = apply_normal_mapping(
            frags, world, cfg, cfg.bump_strength, cfg.bump_frequency,
            view_proj=vp,
        )
        return frags.normal

    _lowers(f, state)

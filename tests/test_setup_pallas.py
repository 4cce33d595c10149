"""Fused Pallas triangle-setup kernel vs the XLA stacked-column setup.

Bit-equality is NOT the contract here: the backend compiler FMA-contracts
mul+add chains inside Pallas bodies while the XLA setup's fusion context
computes the plain two-rounding form (see ops/setup_pallas.py docstring) —
the same divergence class as the documented on-chip Mosaic-vs-XLA contraction.
What these tests pin instead:

  * structural fields are EXACT: valid mask, mesh ids, zero padding rows,
    slot interleave order;
  * float fields agree to contraction-level tolerances (ULPs on unclipped
    records; lerp-amplified but still tiny on clipped ones);
  * a full frame rendered from kernel-setup records differs from the
    XLA-setup frame on at most a sliver of edge-tie pixels.

A logic bug (wrong row/index/rotation/slot) produces O(1) differences and
fails all of these instantly.
"""
import dataclasses
import os

import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import xmath
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed
from d3d12_deferred_renderer_tpu.ops.setup_pallas import setup_triangles_pallas
from d3d12_deferred_renderer_tpu.ops.transform import (
    TRI_MESH_ID,
    TRI_VALID,
    _fv_transform_cols,
    _setup_cols,
    camera_matrices,
    setup_frame_triangles,
)

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _assert_setup_close(got, ref, max_valid_flips=0, min_exact=0.9):
    gp = np.asarray(got.packed)
    rp = np.asarray(ref.packed)
    assert gp.shape == rp.shape
    # Structural fields: exact.
    assert np.array_equal(gp[:, TRI_MESH_ID], rp[:, TRI_MESH_ID])
    assert np.array_equal(gp[:, 30:32], rp[:, 30:32])
    flips = int((gp[:, TRI_VALID] != rp[:, TRI_VALID]).sum())
    assert flips <= max_valid_flips, f"{flips} valid flips"
    assert np.array_equal(np.asarray(got.valid), gp[:, TRI_VALID] > 0.0)

    # Float fields: plain-vs-FMA rounding only.  Most entries are bit-equal;
    # the rest are within ULP-level relative error (clip-lerp amplified on
    # clipped records, still ~1e-5 relative on these scenes).
    exact = gp == rp
    assert exact.mean() > min_exact, (
        f"only {exact.mean():.3f} of entries bit-equal"
    )
    close = np.isclose(gp, rp, rtol=2e-4, atol=2e-4)
    bad = ~(exact | close)
    assert bad.mean() < 1e-4, (
        f"{bad.sum()} record entries beyond contraction tolerance; "
        f"worst rows {np.argwhere(bad)[:5].tolist()}"
    )
    ga = np.asarray(got.aabb)
    ra = np.asarray(ref.aabb)
    assert np.isclose(ga, ra, rtol=2e-4, atol=2e-3).all()


def _paths(state, cfg, cull="back"):
    ref, _ = setup_frame_triangles(state, cfg, cull=cull)
    cfgk = dataclasses.replace(cfg, setup_pallas=True)
    got, _ = setup_frame_triangles(state, cfgk, setup_interpret=True, cull=cull)
    assert np.asarray(ref.valid).sum() > 0  # the scene exercises real work
    return got, ref


def test_benchmark_scene_matches():
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, width=640, height=384)
    meshes = dxr.procedural.benchmark_meshes(n=6, rings=8, segments=12)
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(geo, cfg, lights=dxr.random_point_lights(8, cfg=cfg),
                           placement="grid")
    state = dxr.animate(state)
    got, ref = _paths(state, cfg)
    _assert_setup_close(got, ref)


def test_near_clipping_scene_matches():
    # Camera inside the scene: triangles straddle the near plane, so both clip
    # slots carry real (non-degenerate) output and the clip math is exercised.
    cfg = RendererConfig(
        width=256, height=128, eye=(0.0, 0.2, -0.6), at=(0.0, 0.0, 1.0),
        z_near=0.25,
    )
    geo = dxr.build_scene_geometry([
        dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False),
        dxr.load_obj(os.path.join(ASSETS, "pyramid.obj"), prefer_native=False),
    ])
    state = dxr.make_scene(geo, cfg)
    state = dxr.animate(state)
    got, ref = _paths(state, cfg)
    slot1_valid = np.asarray(ref.valid)[1::2]
    assert slot1_valid.sum() > 0, "test scene never clips — weak test"
    # Heavier clipping -> more lerp-touched entries; the exact fraction drops
    # but everything stays inside contraction tolerance.
    _assert_setup_close(got, ref, min_exact=0.7)


def test_cull_modes_and_tiny_scene():
    cfg = RendererConfig(width=128, height=64)
    geo = dxr.build_scene_geometry([dxr.procedural.cube(1.0)])
    state = dxr.make_scene(geo, cfg)
    state = dxr.animate(state)
    for cull in ("back", "front", "none"):
        got, ref = _paths(state, cfg, cull=cull)
        _assert_setup_close(got, ref)


def test_depth_only_variant_matches_xla():
    cfg = RendererConfig(width=256, height=256)
    meshes = dxr.procedural.benchmark_meshes(n=4, rings=6, segments=10)
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(geo, cfg, placement="grid")
    state = dxr.animate(state)
    gb = state.geometry
    model = xmath.model_matrix(state.position, state.orientation, state.scale)
    view, proj = camera_matrices(state, cfg)
    mvp = model @ (view @ proj)
    c_cols, _, _ = _fv_transform_cols(gb, mvp, model, attrs=False)
    ref = _setup_cols(c_cols, None, None, gb.tri_mesh_id, cfg, cull="none")
    got = setup_triangles_pallas(
        gb, mvp, model, cfg, cull="none", attrs=False, interpret=True
    )
    _assert_setup_close(got, ref)
    # Depth-only contract: attribute lanes 12-26 are exactly zero.
    assert (np.asarray(got.packed)[:, 12:27] == 0.0).all()


def test_full_frame_pixels_match():
    """End-to-end: rasterizing the kernel-setup records produces the same
    frame as the XLA-setup records except (at most) a sliver of edge-tie
    pixels flipped by contraction rounding."""
    cfg = RendererConfig(width=256, height=128, shading="pbr", use_pallas=False)
    geo = dxr.build_scene_geometry(
        [dxr.procedural.cube(1.0), dxr.procedural.torus(0.8, 0.3, 8, 12)]
    )
    state = dxr.make_scene(geo, cfg, lights=dxr.random_point_lights(4, cfg=cfg))
    state = dxr.animate(state)

    tris_ref, _ = setup_frame_triangles(state, cfg)
    cfgk = dataclasses.replace(cfg, setup_pallas=True)
    tris_k, _ = setup_frame_triangles(state, cfgk, setup_interpret=True)
    f_ref = np.asarray(rasterize_packed(tris_ref.packed, cfg.height, cfg.width).depth)
    f_k = np.asarray(rasterize_packed(tris_k.packed, cfg.height, cfg.width).depth)
    # Record-level ULP noise shifts every interpolated depth by ~1 LSB; what
    # must stay rare is a DIFFERENT winner (edge/tie flip): a large depth jump
    # or a coverage change at a pixel.
    cover_flip = (f_ref < 1.0) != (f_k < 1.0)
    big = np.abs(f_ref - f_k) > 1e-4
    flips = (cover_flip | big).mean()
    assert flips < 0.005, f"{flips:.4%} winner-flip pixels"
    # And the broad ULP noise itself stays tiny.
    assert np.abs(f_ref - f_k)[~(cover_flip | big)].max() <= 1e-4


def test_instanced_geometry_and_front_cw():
    """Instanced buffers + the front_ccw=False winding convention both route
    through the kernel unchanged."""
    pool = [dxr.procedural.cube(1.0), dxr.procedural.torus(0.7, 0.25, 6, 8)]
    geo = dxr.build_instanced_geometry(pool, [0, 1, 1, 0])
    cfg = RendererConfig(width=256, height=128)
    state = dxr.make_scene(geo, cfg, placement="grid")
    state = dxr.animate(state)
    got, ref = _paths(state, cfg)
    _assert_setup_close(got, ref)
    # Opposite winding convention.
    ref2, _ = setup_frame_triangles(state, cfg, front_ccw=False)
    cfgk = dataclasses.replace(cfg, setup_pallas=True)
    got2, _ = setup_frame_triangles(
        state, cfgk, setup_interpret=True, front_ccw=False
    )
    _assert_setup_close(got2, ref2)


def test_fuzz_random_poses():
    """Randomized camera/pose sweep (fixed seed): any indexing/rotation/slot
    bug produces O(1) record divergence and trips the tolerance gates."""
    rng = np.random.default_rng(7)
    geo = dxr.build_scene_geometry(
        [dxr.procedural.torus(0.9, 0.35, 7, 9), dxr.procedural.cube(1.3)]
    )
    for trial in range(4):
        eye = tuple(rng.uniform(-3, 3, 3).tolist())
        at = tuple(rng.uniform(-1, 1, 3).tolist())
        if np.allclose(eye, at):
            at = (at[0] + 1.0, at[1], at[2])
        cfg = RendererConfig(
            width=192, height=96, eye=eye, at=at,
            z_near=float(rng.uniform(0.05, 0.8)),
        )
        state = dxr.make_scene(geo, cfg)
        state = dxr.animate(state, yaw_per_frame=float(rng.uniform(0, 2)))
        got, ref = _paths(state, cfg)
        _assert_setup_close(got, ref, min_exact=0.6)


def test_shadow_map_call_site_through_kernel():
    """Drives render_shadow_map's own kernel branch (square SxS viewport,
    cull='none', depth-only) via setup_interpret, against the XLA-setup map."""
    from d3d12_deferred_renderer_tpu.ops.shadows import render_shadow_map

    cfg = dataclasses.replace(
        RendererConfig(width=256, height=128), shadows=True,
        shadow_map_size=128, use_pallas=False,
    )
    geo = dxr.build_scene_geometry(
        [dxr.procedural.cube(1.0), dxr.procedural.torus(0.8, 0.3, 8, 12)]
    )
    state = dxr.make_scene(geo, cfg)
    state = dxr.animate(state)
    sd_ref, lvp_ref = render_shadow_map(state, cfg)
    cfgk = dataclasses.replace(cfg, setup_pallas=True)
    sd_k, lvp_k = render_shadow_map(state, cfgk, setup_interpret=True)
    assert np.array_equal(np.asarray(lvp_ref), np.asarray(lvp_k))
    sr = np.asarray(sd_ref)
    sk = np.asarray(sd_k)
    cover_flip = (sr < 1.0) != (sk < 1.0)
    big = np.abs(sr - sk) > 1e-4
    assert (cover_flip | big).mean() < 0.005
    # The map actually contains occluders (the default light frustum spans a
    # 24-unit box, so the small two-mesh scene covers only ~0.5% of it).
    assert (sr < 1.0).mean() > 0.002

"""Geometry-sharded (sort-last compositing) multi-chip rendering: each chip
rasterizes a contiguous triangle slice, partial fragment buffers composite via
depth-min + submission-order tie-break collectives, shading runs on sub-bands.
Output must equal the single-device STAGED render exactly (Lambert) or within
the band path's 1-LSB light-summation bound (PBR)."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.parallel import (
    make_mesh,
    render_frames_batch_tri_sharded,
    render_tri_sharded,
)
from d3d12_deferred_renderer_tpu.parallel.sharded import animation_times, _with_time

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _scene(cfg, lights=None, materials=None):
    geo = dxr.build_scene_geometry(
        [
            dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False),
            dxr.load_obj(os.path.join(ASSETS, "pyramid.obj"), prefer_native=False),
        ]
    )
    state = dxr.make_scene(geo, cfg, lights=lights, materials=materials)
    return dxr.animate(state)


def _tri_mesh(n_t, rows=None):
    if rows is None:
        return make_mesh((1, n_t), axis_names=("frame", "tri"),
                         devices=jax.devices()[: n_t])
    return make_mesh((rows, n_t), axis_names=("rows", "tri"),
                     devices=jax.devices()[: rows * n_t])


def test_tri_sharded_matches_single_device_lambert():
    cfg = dxr.RendererConfig(width=128, height=32, use_pallas=False)
    state = _scene(cfg)
    out = np.asarray(render_tri_sharded(state, cfg, _tri_mesh(4), tri_axis="tri"))
    single = np.asarray(dxr.render(state, cfg))
    np.testing.assert_array_equal(out, single)


def test_tri_times_rows_matches_single_device_lambert():
    cfg = dxr.RendererConfig(width=128, height=32, use_pallas=False)
    state = _scene(cfg)
    mesh = _tri_mesh(2, rows=2)
    out = np.asarray(
        render_tri_sharded(state, cfg, mesh, tri_axis="tri", rows_axis="rows")
    )
    single = np.asarray(dxr.render(state, cfg))
    np.testing.assert_array_equal(out, single)


def test_tri_sharded_matches_single_device_pbr():
    cfg = dxr.RendererConfig(
        width=128, height=32, use_pallas=False, shading="pbr"
    )
    lights = dxr.random_point_lights(8, cfg=cfg)
    state = _scene(cfg, lights=lights)
    out = np.asarray(render_tri_sharded(state, cfg, _tri_mesh(4), tri_axis="tri"))
    single = np.asarray(dxr.render(state, cfg))
    # Sub-band light culling changes the tile grid (hence the light summation
    # order) exactly like the rows-band path: 1 u8 LSB bound.
    diff = np.abs(out.astype(int) - single.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_tri_sharded_pallas_interpret_matches_reference():
    """Interpret-mode Pallas raster slices + composite == pure-XLA single chip
    (the rasterizer bit-identity invariant holds per slice, and the composite
    is exact)."""
    cfg = dxr.RendererConfig(
        width=128, height=32, tile_h=8, tile_w=128, use_pallas=True
    )
    state = _scene(cfg)
    out = np.asarray(
        render_tri_sharded(
            state, cfg, _tri_mesh(4), tri_axis="tri", pallas_interpret=True
        )
    )
    single = np.asarray(
        dxr.render(state, dataclasses.replace(cfg, use_pallas=False))
    )
    np.testing.assert_array_equal(out, single)


def test_tri_sharded_tiebreak_matches_first_wins():
    """Two meshes with IDENTICAL transforms (every covered pixel is a perfect
    depth tie between triangle slices on different chips) must resolve to the
    first-submitted mesh, exactly like the single-chip depth-LESS first-wins
    rasterizer.  Varied materials make a wrong winner visible."""
    cfg = dxr.RendererConfig(
        width=128, height=32, use_pallas=False, shading="pbr"
    )
    geo = dxr.build_scene_geometry(
        [
            dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False),
            dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False),
        ]
    )
    state = dxr.make_scene(geo, cfg, materials=dxr.Materials.varied(2))
    state = dxr.animate(state)
    # Coincident transforms: same position/orientation/scale for both meshes.
    state = dataclasses.replace(
        state,
        position=jnp.zeros_like(state.position),
        orientation=jnp.broadcast_to(
            state.orientation[:1], state.orientation.shape
        ),
        scale=jnp.ones_like(state.scale),
    )
    # Cube = 12 triangles; 4 shards of 6 put mesh 0 on chips 0-1, mesh 1 on 2-3.
    out = np.asarray(render_tri_sharded(state, cfg, _tri_mesh(4), tri_axis="tri"))
    single = np.asarray(dxr.render(state, cfg))
    diff = np.abs(out.astype(int) - single.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_tri_sharded_bloom_fxaa_bump_match_single_device():
    """Cross-pixel post filters over the COMBINED (rows, tri) axis tuple:
    bloom's all-gathered bright field, FXAA's 1-row ppermute halo, and
    block-aligned normal mapping must all treat the tuple as one flat band
    axis (sub-bands of 32 rows here) and match the single-chip render within
    the band path's PBR light-culling bound."""
    cfg = dxr.RendererConfig(
        width=256, height=128, use_pallas=False, shading="pbr",
        bloom=True, fxaa=True, normal_mapping=True,
    )
    lights = dxr.random_point_lights(8, cfg=cfg)
    state = _scene(cfg, lights=lights)
    mesh = _tri_mesh(2, rows=2)
    out = np.asarray(
        render_tri_sharded(state, cfg, mesh, tri_axis="tri", rows_axis="rows")
    )
    single = np.asarray(dxr.render(state, cfg))
    diff = np.abs(out.astype(int) - single.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_tri_sharded_lambert_fxaa_exact():
    """Lambert + FXAA has no culling differences: the halo exchange over the
    (rows, tri) tuple must make the composite bit-identical to one chip."""
    cfg = dxr.RendererConfig(width=128, height=64, use_pallas=False, fxaa=True)
    state = _scene(cfg)
    mesh = _tri_mesh(2, rows=2)
    out = np.asarray(
        render_tri_sharded(state, cfg, mesh, tri_axis="tri", rows_axis="rows")
    )
    single = np.asarray(dxr.render(state, cfg))
    np.testing.assert_array_equal(out, single)


def test_tri_sharded_mesh_order_independent():
    """The cross-band collectives must be correct for ANY mesh declaration
    order (round-4 defect: ppermute flattens a tuple axis in MESH-DECLARATION
    order, not tuple order, so a mesh declared ('tri', 'rows') scrambled the
    FXAA halo at sub-band boundaries while ('rows', 'tri') was exact).  The
    same logical request on three declaration orders must produce IDENTICAL
    frames, each within the single-chip PBR bound."""
    cfg = dataclasses.replace(
        dxr.RendererConfig(
            width=256, height=128, use_pallas=False, shading="pbr",
            bloom=True, fxaa=True,
        )
    )
    lights = dxr.random_point_lights(8, cfg=cfg)
    state = _scene(cfg, lights=lights)
    single = np.asarray(dxr.render(state, cfg))
    outs = {}
    for names, shape in [
        (("rows", "tri"), (2, 2)),
        (("tri", "rows"), (2, 2)),
        (("frame", "tri", "rows"), (2, 2, 2)),
    ]:
        mesh = make_mesh(shape, axis_names=names,
                         devices=jax.devices()[: int(np.prod(shape))])
        out = np.asarray(
            render_tri_sharded(state, cfg, mesh, tri_axis="tri",
                               rows_axis="rows")
        )
        diff = np.abs(out.astype(int) - single.astype(int))
        assert diff.max() <= 1, (names, int(diff.max()))
        assert (diff > 0).mean() < 2e-3, names
        outs[names] = out
    np.testing.assert_array_equal(outs[("rows", "tri")], outs[("tri", "rows")])
    np.testing.assert_array_equal(
        outs[("rows", "tri")], outs[("frame", "tri", "rows")]
    )


def test_tri_sharded_full_stack_mesh_order():
    """Shadows + bloom + FXAA together on the FAILING round-4 mesh order
    ('tri', 'rows') — the combination no test covered (shadows were only
    tested without bloom/FXAA and vice versa)."""
    cfg = dxr.RendererConfig(
        width=128, height=32, use_pallas=False, shading="pbr",
        shadows=True, shadow_map_size=64, bloom=True, fxaa=True,
    )
    lights = dxr.random_point_lights(8, cfg=cfg)
    state = _scene(cfg, lights=lights)
    mesh = make_mesh((2, 2), axis_names=("tri", "rows"),
                     devices=jax.devices()[:4])
    out = np.asarray(
        render_tri_sharded(state, cfg, mesh, tri_axis="tri", rows_axis="rows")
    )
    single = np.asarray(dxr.render(state, cfg))
    diff = np.abs(out.astype(int) - single.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_tri_sharded_shadows_match_single_device():
    """Shadows on the tri-sharded path: the shadow map renders replicated on
    every chip from the full (unsliced) triangle stream, so visibility — and
    the shaded output — must match the single-chip render within the PBR
    culling bound."""
    cfg = dxr.RendererConfig(
        width=128, height=32, use_pallas=False, shading="pbr",
        shadows=True, shadow_map_size=64,
    )
    lights = dxr.random_point_lights(8, cfg=cfg)
    state = _scene(cfg, lights=lights)
    out = np.asarray(render_tri_sharded(state, cfg, _tri_mesh(4), tri_axis="tri"))
    single = np.asarray(dxr.render(state, cfg))
    diff = np.abs(out.astype(int) - single.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_tri_sharded_batch_three_axis():
    """frames x triangles x rows on a (2, 2, 2) mesh — the full DP x geometry
    x pixel composition — against per-frame single-chip renders."""
    cfg = dxr.RendererConfig(width=128, height=32, use_pallas=False)
    state = _scene(cfg)
    mesh = make_mesh(
        (2, 2, 2), axis_names=("frame", "tri", "rows"),
        devices=jax.devices()[:8],
    )
    times = animation_times(0.0, 2)
    frames = np.asarray(
        render_frames_batch_tri_sharded(
            state, times, cfg, mesh, frame_axis="frame", tri_axis="tri",
            rows_axis="rows",
        )
    )
    for i, t in enumerate(np.asarray(times)):
        single = np.asarray(dxr.render(_with_time(state, float(t)), cfg))
        np.testing.assert_array_equal(frames[i], single)


def test_tri_sharded_overflow_signal():
    """The no-silent-drop contract crosses the composite: a too-small per-tile
    cap on any slice must surface in the summed stats."""
    cfg = dxr.RendererConfig(
        width=128, height=32, tile_h=8, tile_w=128, use_pallas=True,
        max_tris_per_tile=1,
    )
    state = _scene(cfg)
    _, stats = render_tri_sharded(
        state, cfg, _tri_mesh(2), tri_axis="tri", pallas_interpret=True,
        return_stats=True,
    )
    assert int(stats["overflow"]) > 0
    ok_cfg = dataclasses.replace(cfg, max_tris_per_tile=64)
    _, stats2 = render_tri_sharded(
        state, cfg=ok_cfg, mesh=_tri_mesh(2), tri_axis="tri",
        pallas_interpret=True, return_stats=True,
    )
    assert int(stats2["overflow"]) == 0


def test_tri_sharded_indivisible_band_raises():
    cfg = dxr.RendererConfig(width=128, height=30, use_pallas=False)
    state = _scene(cfg)
    with pytest.raises(ValueError):
        render_tri_sharded(state, cfg, _tri_mesh(4), tri_axis="tri")

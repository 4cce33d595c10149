"""Robustness edge cases: scenes that could break static-shape assumptions."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _cube_scene(cfg, **kw):
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    return dxr.make_scene(geo, cfg, **kw)


def small_cfg(**kw):
    return dxr.RendererConfig(width=96, height=48, use_pallas=False, **kw)


def test_everything_behind_camera_renders_background():
    cfg = small_cfg()
    state = _cube_scene(cfg)
    state = dataclasses.replace(
        state, position=jnp.asarray([[0.0, 0.0, -50.0]], jnp.float32)
    )
    _, frame = dxr.step_frame(state, cfg)
    assert np.asarray(frame).sum() == 0  # pure background (black, parity quirk)


def test_everything_offscreen_left():
    cfg = small_cfg()
    state = _cube_scene(cfg)
    state = dataclasses.replace(
        state, position=jnp.asarray([[-100.0, 0.0, 0.0]], jnp.float32)
    )
    _, frame = dxr.step_frame(state, cfg)
    assert np.asarray(frame).sum() == 0


def test_zero_scale_mesh():
    cfg = small_cfg()
    state = _cube_scene(cfg)
    state = dataclasses.replace(state, scale=jnp.zeros((1, 3), jnp.float32))
    _, frame = dxr.step_frame(state, cfg)  # must not NaN/crash
    assert np.isfinite(np.asarray(frame)).all()
    assert np.asarray(frame).sum() == 0


def test_camera_inside_mesh():
    cfg = small_cfg()
    state = _cube_scene(cfg)
    state = dataclasses.replace(
        state,
        position=jnp.asarray([[0.0, 1.0, -8.0]], jnp.float32),  # at the eye
        scale=jnp.full((1, 3), 4.0, jnp.float32),
    )
    _, frame = dxr.step_frame(state, cfg)
    assert np.isfinite(np.asarray(frame)).all()


def test_single_pixel_sized_mesh():
    cfg = small_cfg()
    state = _cube_scene(cfg)
    state = dataclasses.replace(state, scale=jnp.full((1, 3), 1e-3, jnp.float32))
    _, frame = dxr.step_frame(state, cfg)
    assert np.isfinite(np.asarray(frame)).all()


def test_pbr_single_light_zero_radius():
    cfg = small_cfg(shading="pbr")
    lights = dxr.Lights(
        direction=jnp.asarray([-0.3, -0.2, -1.0]),
        color=jnp.ones(3),
        point_position=jnp.zeros((1, 3)),
        point_color=jnp.ones((1, 3)),
        point_radius=jnp.zeros((1,)),   # degenerate radius
        point_intensity=jnp.ones((1,)),
    )
    state = _cube_scene(cfg, lights=lights)
    _, frame = dxr.step_frame(state, cfg)
    assert np.isfinite(np.asarray(frame)).all()


def test_many_meshes_tiny_screen():
    cfg = dxr.RendererConfig(width=32, height=16, use_pallas=False, shading="pbr")
    meshes = [dxr.procedural.cube(0.5) for _ in range(12)]
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(geo, cfg, placement="grid",
                           lights=dxr.random_point_lights(4, cfg=cfg))
    _, frame = dxr.step_frame(state, cfg)
    assert np.asarray(frame).shape == (16, 32, 3)


def test_huge_far_plane_and_tiny_near():
    cfg = small_cfg(z_near=1e-3, z_far=1e5)
    state = _cube_scene(cfg)
    _, frame = dxr.step_frame(state, cfg)
    f = np.asarray(frame)
    assert np.isfinite(f).all()
    assert (f.sum(-1) > 0).any()  # cube still visible


def test_pallas_empty_tile_lists():
    """Pallas raster with a scene where many tiles bin zero triangles."""
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_binned
    from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles

    cfg = dxr.RendererConfig(width=256, height=64, use_pallas=False)
    state = _cube_scene(cfg)
    state = dataclasses.replace(state, scale=jnp.full((1, 3), 0.2, jnp.float32))
    tris, _ = setup_frame_triangles(state, cfg)
    frags = rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    mid = np.asarray(frags.mesh_id)
    assert (mid >= 0).any()
    assert (mid == -1).any()

"""Frame-program tests: golden image, animation semantics, batched rendering."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.utils import read_png, write_png

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def reference_scene(cfg):
    cube = dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)
    pyr = dxr.load_obj(os.path.join(ASSETS, "pyramid.obj"), prefer_native=False)
    geo = dxr.build_scene_geometry([cube, pyr])
    return dxr.make_scene(geo, cfg)


def small_cfg(**kw):
    return dxr.RendererConfig(width=160, height=90, use_pallas=False, **kw)


def test_golden_reference_scene():
    """Render the reference scene (cube + pyramid, Lambert, frame 10) and compare
    to the committed golden PNG bit-exactly — locks the full pipeline, including
    G-buffer quantization, fill rules, and Lambert+gamma."""
    cfg = small_cfg()
    state = reference_scene(cfg)
    frame = None
    for _ in range(10):
        state, frame = dxr.step_frame_jit(state, cfg)
    frame = np.asarray(frame)

    golden_path = os.path.join(GOLDEN_DIR, "reference_160x90_f10.png")
    if not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(golden_path, frame)
        pytest.skip("golden image generated; rerun to compare")
    golden = read_png(golden_path)
    diff = np.abs(frame.astype(int) - golden.astype(int))
    # Allow <= 1 LSB drift on < 0.1% of pixels (backend math reassociation).
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"
    assert (diff > 0).mean() < 1e-3


def test_frame_nonempty_and_shape():
    cfg = small_cfg()
    state = reference_scene(cfg)
    state, frame = dxr.step_frame(state, cfg)
    frame = np.asarray(frame)
    assert frame.shape == (90, 160, 3)
    assert frame.dtype == np.uint8
    covered = (frame.sum(-1) > 0).sum()
    assert covered > 100  # both meshes visible


def test_animation_advances_and_wraps():
    cfg = small_cfg()
    state = reference_scene(cfg)
    s1 = dxr.animate(state)
    assert float(s1.time) == pytest.approx(0.01)
    np.testing.assert_allclose(np.asarray(s1.orientation[:, 1]), 0.01)
    # Wrap at 2*pi (main.cpp:203).
    import dataclasses
    s = dataclasses.replace(state, time=jnp.asarray(2 * np.pi - 0.005, jnp.float32))
    s2 = dxr.animate(s)
    assert float(s2.time) == pytest.approx(0.005, abs=1e-5)


def test_animation_changes_the_image():
    cfg = small_cfg()
    state = reference_scene(cfg)
    _, f1 = dxr.step_frame(state, cfg)
    s2 = state
    for _ in range(50):
        s2 = dxr.animate(s2)
    _, f2 = dxr.step_frame(s2, cfg)
    assert (np.asarray(f1) != np.asarray(f2)).any()


def test_render_batch_matches_sequential():
    cfg = small_cfg()
    state = reference_scene(cfg)
    final, frames = jax.jit(
        lambda s: dxr.render_batch(s, cfg, 3), donate_argnums=()
    )(state)
    frames = np.asarray(frames)
    s = state
    for i in range(3):
        s, f = dxr.step_frame(s, cfg)
        np.testing.assert_array_equal(frames[i], np.asarray(f))
    assert float(final.time) == pytest.approx(float(s.time))


def test_pbr_frame_renders():
    cfg = small_cfg(shading="pbr")
    state = reference_scene(cfg)
    lights = dxr.random_point_lights(16, cfg=cfg)
    import dataclasses
    state = dataclasses.replace(state, lights=lights)
    _, frame = dxr.step_frame(state, cfg)
    frame = np.asarray(frame)
    assert frame.shape == (90, 160, 3)
    assert (frame.sum(-1) > 0).sum() > 100


def test_shadowed_frame_renders():
    cfg = small_cfg(shading="pbr", shadows=True, shadow_map_size=128)
    state = reference_scene(cfg)
    _, frame = dxr.step_frame(state, cfg)
    assert np.asarray(frame).shape == (90, 160, 3)


def test_post_chain_frame_renders():
    cfg = small_cfg(shading="pbr", bloom=True, fxaa=True)
    state = reference_scene(cfg)
    _, frame = dxr.step_frame(state, cfg)
    assert np.asarray(frame).shape == (90, 160, 3)


def test_golden_pbr_scene():
    """PBR golden: benchmark-style scene with point lights, varied materials, and
    per-tile culling at 160x96 on CPU — locks the PBR + culling + post chain."""
    cfg = dxr.RendererConfig(width=160, height=96, use_pallas=False, shading="pbr")
    meshes = dxr.procedural.benchmark_meshes(n=4, rings=8, segments=16)
    geo = dxr.build_scene_geometry(meshes)
    state = dxr.make_scene(
        geo, cfg, lights=dxr.random_point_lights(24, cfg=cfg), placement="grid",
        materials=dxr.Materials.varied(geo.num_meshes),
    )
    for _ in range(3):
        state, frame = dxr.step_frame_jit(state, cfg)
    frame = np.asarray(frame)

    golden_path = os.path.join(GOLDEN_DIR, "pbr_160x96_f3.png")
    if not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        write_png(golden_path, frame)
        pytest.skip("golden image generated; rerun to compare")
    golden = read_png(golden_path)
    diff = np.abs(frame.astype(int) - golden.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_camera_orbit_moves_camera():
    cfg = small_cfg(animate_camera=True)
    state = reference_scene(cfg)
    s1 = state
    for _ in range(30):
        s1, _ = dxr.step_frame(s1, cfg)
    assert not np.allclose(np.asarray(s1.camera.eye), np.asarray(state.camera.eye))


def test_render_stats_overflow_signal():
    """The no-silent-drop invariant at the frame level: render_stats reports
    overflow == 0 on a healthy config, and a deliberately starved per-tile
    light cap reports a nonzero overflow instead of silently under-shading
    (VERDICT round 1 item 3 / advisor finding on lighting.py:318)."""
    cfg = small_cfg(shading="pbr", max_lights_per_tile=1)
    state = reference_scene(cfg)
    lights = dxr.random_point_lights(32, cfg=cfg, radius=6.0)
    state = dxr.make_scene(state_geo_from(state), cfg, lights=lights)

    frame, stats = dxr.frame.render_stats(state, cfg)
    assert int(stats["overflow"]) > 0  # starved cap -> loud signal

    healthy = small_cfg(shading="pbr", max_lights_per_tile=32)
    frame2, stats2 = dxr.frame.render_stats(state, healthy)
    assert int(stats2["overflow"]) == 0
    assert frame2.shape == frame.shape


def state_geo_from(state):
    """Rebuild host geometry from a SceneState (test helper)."""
    import numpy as _np
    from d3d12_deferred_renderer_tpu.models.meshlib import SceneGeometry

    g = state.geometry
    return SceneGeometry(
        positions=_np.asarray(g.positions),
        normals=_np.asarray(g.normals),
        uvs=_np.asarray(g.uvs),
        indices=_np.asarray(g.indices),
        tri_mesh_id=_np.asarray(g.tri_mesh_id),
        vertex_mesh_id=_np.asarray(g.vertex_mesh_id),
        vertex_offsets=_np.zeros(2, _np.int32),
        vertex_counts=_np.zeros(2, _np.int32),
        index_offsets=_np.zeros(2, _np.int32),
        index_counts=_np.zeros(2, _np.int32),
        names=("a", "b"),
    )


def test_orbit_continuous_across_time_wrap():
    """The orbiting camera must not teleport when the frame-count clock wraps
    at 2*pi (a fractional orbit rate used to snap the eye across the scene)."""
    import dataclasses

    from d3d12_deferred_renderer_tpu.xmath import XM_2PI

    cfg = small_cfg(animate_camera=True, orbit_speed=0.5, shading="pbr")
    state = reference_scene(cfg)
    eps = cfg.yaw_per_frame
    before = dxr.animate(
        dataclasses.replace(state, time=jnp.float32(XM_2PI - 1.5 * eps)),
        cfg=cfg,
    )
    after = dxr.animate(before, cfg=cfg)  # crosses the wrap
    jump = float(jnp.linalg.norm(after.camera.eye - before.camera.eye))
    # One frame of orbit moves the eye by ~radius * speed * yaw_per_frame.
    assert jump < 4.0 * cfg.orbit_radius * cfg.yaw_per_frame, jump

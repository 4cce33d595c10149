"""Instanced rendering: N instances with shared vertex storage must render exactly
like N duplicated meshes (the DrawIndexedInstanced instanceCount>1 capability the
reference exposes but never uses, main.cpp:240)."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _pool():
    cube = dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)
    pyr = dxr.load_obj(os.path.join(ASSETS, "pyramid.obj"), prefer_native=False)
    return [cube, pyr]


def test_instanced_matches_duplicated():
    cfg = dxr.RendererConfig(width=160, height=90, use_pallas=False)
    pool = _pool()
    instance_of = [0, 1, 0, 1, 0]

    inst_geo = dxr.build_instanced_geometry(pool, instance_of)
    dup_geo = dxr.build_scene_geometry([pool[k] for k in instance_of])

    assert inst_geo.num_meshes == dup_geo.num_meshes == 5
    assert inst_geo.num_triangles == dup_geo.num_triangles
    # Shared storage: base pool only (24 + 16 vertices), not 5 copies.
    assert inst_geo.positions.shape[0] == 40
    assert dup_geo.positions.shape[0] == 24 * 3 + 16 * 2

    s_inst = dxr.make_scene(inst_geo, cfg)
    s_dup = dxr.make_scene(dup_geo, cfg)
    for _ in range(3):
        s_inst, f_inst = dxr.step_frame(s_inst, cfg)
        s_dup, f_dup = dxr.step_frame(s_dup, cfg)
    np.testing.assert_array_equal(np.asarray(f_inst), np.asarray(f_dup))


def test_instanced_per_instance_transforms_and_materials():
    cfg = dxr.RendererConfig(width=128, height=64, use_pallas=False, shading="pbr")
    pool = [dxr.procedural.uv_sphere(0.5, 8, 16)]
    geo = dxr.build_instanced_geometry(pool, [0, 0, 0])
    mats = dxr.Materials.varied(3)
    state = dxr.make_scene(geo, cfg, placement="grid", materials=mats,
                           lights=dxr.random_point_lights(4, cfg=cfg))
    _, frame = dxr.step_frame(state, cfg)
    f = np.asarray(frame)
    assert (f.sum(-1) > 0).sum() > 50
    # Three instances at different grid positions with different materials:
    # more than one distinct hue present.
    covered = f[f.sum(-1) > 40]
    assert len(np.unique(covered, axis=0)) > 10


def test_instanced_validate_scene():
    from d3d12_deferred_renderer_tpu.utils.debug import validate_scene

    cfg = dxr.RendererConfig(width=64, height=64)
    geo = dxr.build_instanced_geometry(_pool(), [0, 1, 1])
    state = dxr.make_scene(geo, cfg)
    validate_scene(state, cfg)  # no raise


def test_instanced_bad_reference_raises():
    import pytest

    with pytest.raises(ValueError):
        dxr.build_instanced_geometry(_pool(), [0, 2])


def test_instanced_scene_io_roundtrip(tmp_path):
    from d3d12_deferred_renderer_tpu.scene_io import load_scene, save_scene

    cfg = dxr.RendererConfig(width=64, height=32, use_pallas=False)
    geo = dxr.build_instanced_geometry(_pool(), [0, 1])
    state = dxr.make_scene(geo, cfg)
    state, _ = dxr.step_frame(state, cfg)
    p = str(tmp_path / "inst.npz")
    save_scene(p, state)
    restored = load_scene(p, dxr.make_scene(geo, cfg))
    _, f1 = dxr.step_frame(state, cfg)
    _, f2 = dxr.step_frame(restored, cfg)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

"""Scene checkpoint/resume and supersampling tests."""
import dataclasses
import os

import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.scene_io import load_scene, save_scene

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def _scene(cfg):
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    return dxr.make_scene(geo, cfg)


def test_save_load_roundtrip_bitexact(tmp_path):
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    state = _scene(cfg)
    for _ in range(7):
        state, _ = dxr.step_frame(state, cfg)
    p = str(tmp_path / "scene.npz")
    save_scene(p, state)
    restored = load_scene(p, _scene(cfg))
    assert float(restored.time) == float(state.time)
    # Resuming produces the identical next frame.
    _, f_orig = dxr.step_frame(state, cfg)
    _, f_rest = dxr.step_frame(restored, cfg)
    np.testing.assert_array_equal(np.asarray(f_orig), np.asarray(f_rest))


def test_load_rejects_mismatched_structure(tmp_path):
    cfg = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    state = _scene(cfg)
    p = str(tmp_path / "scene.npz")
    save_scene(p, state)
    other = dataclasses.replace(state, lights=dxr.random_point_lights(4, cfg=cfg))
    with pytest.raises(ValueError, match="tree structure"):
        load_scene(p, other)


def test_supersampling_smooths_edges():
    cfg1 = dxr.RendererConfig(width=96, height=48, use_pallas=False)
    cfg4 = dataclasses.replace(cfg1, supersample=2)
    state = _scene(cfg1)
    state = dxr.animate(state)
    f1 = np.asarray(dxr.render(state, cfg1))
    f2 = np.asarray(dxr.render(state, cfg4))
    assert f1.shape == f2.shape == (48, 96, 3)
    # SSAA produces strictly more distinct intensity levels along silhouettes.
    assert len(np.unique(f2)) > len(np.unique(f1))
    # Interiors agree closely (same shading, just filtered edges).
    interior = (f1.sum(-1) > 0) & (f2.sum(-1) > 0)
    assert np.abs(f1[interior].astype(int) - f2[interior].astype(int)).mean() < 12


def test_old_checkpoint_without_fv_buffers_loads(tmp_path):
    """A checkpoint saved by an older build (no host-precomputed fv_* buffers)
    must load against a fresh scene and resume on the indexed fallback path —
    strict treedef equality used to make that documented path unreachable."""
    import dataclasses

    from d3d12_deferred_renderer_tpu.scene_io import _without_fv

    cfg = dxr.RendererConfig(width=96, height=32, use_pallas=False)
    geo = dxr.build_scene_geometry([dxr.procedural.cube(1.0)])
    like = dxr.make_scene(geo, cfg)
    old = _without_fv(dxr.animate(like))
    p = tmp_path / "old.npz"
    save_scene(str(p), old)
    resumed = load_scene(str(p), like)
    assert resumed.geometry.fv_positions is None
    frame = np.asarray(dxr.render(resumed, cfg))
    ref = np.asarray(dxr.render(dxr.animate(like), cfg))
    np.testing.assert_array_equal(frame, ref)


def test_checkpoint_dtype_mismatch_rejected(tmp_path):
    """Same shapes, different dtype (e.g. an x64 session) must be refused."""
    import dataclasses

    cfg = dxr.RendererConfig(width=96, height=32, use_pallas=False)
    geo = dxr.build_scene_geometry([dxr.procedural.cube(1.0)])
    like = dxr.make_scene(geo, cfg)
    p = tmp_path / "x64.npz"
    save_scene(str(p), like)
    # Corrupt one leaf's dtype in the saved file.
    data = dict(np.load(str(p)))
    for k, v in data.items():
        if k.startswith("leaf_") and v.dtype == np.float32:
            data[k] = v.astype(np.float64)
            break
    np.savez_compressed(str(p), **data)
    with pytest.raises(ValueError, match="dtype"):
        load_scene(str(p), like)

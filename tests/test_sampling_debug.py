"""Bilinear/nearest sampler (the C10 static-sampler analog) and debug-layer tests."""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.sampling import sample_bilinear, sample_nearest
from d3d12_deferred_renderer_tpu.utils.debug import validate_scene

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def test_bilinear_at_texel_centers_equals_nearest():
    """The reference's lighting uv grid lands exactly on texel centers
    (lighting.hlsl:27, 34-35) — bilinear must reduce to nearest there."""
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(0, 1, (8, 16, 4)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(8), np.arange(16), indexing="ij")
    uv = jnp.asarray(
        np.stack([(xs + 0.5) / 16.0, (ys + 0.5) / 8.0], -1).astype(np.float32)
    )
    bi = np.asarray(sample_bilinear(tex, uv))
    ne = np.asarray(sample_nearest(tex, uv))
    np.testing.assert_allclose(bi, ne, atol=1e-6)
    np.testing.assert_allclose(bi, np.asarray(tex), atol=1e-6)


def test_bilinear_midpoint_average():
    tex = jnp.asarray([[0.0, 1.0]], jnp.float32)[..., None]  # 1x2 texels
    uv = jnp.asarray([[0.5, 0.5]], jnp.float32)  # exactly between centers
    out = float(sample_bilinear(tex, uv)[0, 0])
    assert out == pytest.approx(0.5)


def test_bilinear_clamp_addressing():
    tex = jnp.asarray([[1.0, 2.0], [3.0, 4.0]], jnp.float32)[..., None]
    for uv, expect in [((0.0, 0.0), 1.0), ((1.0, 1.0), 4.0), ((-3.0, 0.2), None)]:
        out = np.asarray(sample_bilinear(tex, jnp.asarray([uv], jnp.float32)))
        assert np.isfinite(out).all()
        if expect is not None:
            assert out[0, 0] == pytest.approx(expect)


def test_validate_scene_accepts_good_state():
    cfg = dxr.RendererConfig(width=64, height=64)
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    state = dxr.make_scene(geo, cfg)
    validate_scene(state, cfg)  # no raise


def test_validate_scene_rejects_bad_indices():
    cfg = dxr.RendererConfig(width=64, height=64)
    geo = dxr.build_scene_geometry(
        [dxr.load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)]
    )
    state = dxr.make_scene(geo, cfg)
    bad_geo = dataclasses.replace(
        state.geometry, indices=state.geometry.indices.at[0].set(10_000)
    )
    state = dataclasses.replace(state, geometry=bad_geo)
    with pytest.raises(ValueError, match="out of range"):
        validate_scene(state, cfg)

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


def _bilinear_cmp_oracle(tex, uv, ref, bias=0.0):
    """Four independently-clamped element gathers — the semantics
    sample_bilinear_cmp's one-gather quad-packed fast path must reproduce
    bit-exactly (taps first, then the bilinear weighting of binary results)."""
    Ht, Wt = tex.shape
    tex_flat = tex.reshape(-1)
    fx = uv[..., 0] * Wt - 0.5
    fy = uv[..., 1] * Ht - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def tap(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, Wt - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, Ht - 1)
        return (ref <= tex_flat[yi * Wt + xi] + bias).astype(jnp.float32)

    c00, c10 = tap(x0, y0), tap(x0 + 1, y0)
    c01, c11 = tap(x0, y0 + 1), tap(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def test_bilinear_cmp_quad_pack_matches_four_tap_oracle():
    """Random uvs (including out-of-[0,1] coords past every CLAMP edge) must
    give BIT-identical visibility from the quad-packed single-gather path."""
    from d3d12_deferred_renderer_tpu.ops.sampling import sample_bilinear_cmp

    rng = np.random.default_rng(7)
    tex = jnp.asarray(rng.uniform(0, 1, (13, 9)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-0.4, 1.4, (257, 2)).astype(np.float32))
    # Exact texel corners/centers and the extreme corners of the clamp range.
    uv = jnp.concatenate(
        [uv, jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5],
                          [-5.0, 0.5], [0.5, 5.0], [5.0, -5.0]], jnp.float32)]
    )
    ref = jnp.asarray(rng.uniform(0, 1, (uv.shape[0],)).astype(np.float32))
    got = np.asarray(sample_bilinear_cmp(tex, uv, ref, bias=2e-3))
    want = np.asarray(_bilinear_cmp_oracle(tex, uv, ref, bias=2e-3))
    np.testing.assert_array_equal(got, want)


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

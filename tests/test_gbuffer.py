"""G-buffer format-quantization parity tests (main.cpp:476-488; geometry.hlsl:42-55)."""
import jax.numpy as jnp
import numpy as np

from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.gbuffer import (
    decode_gbuffer,
    encode_gbuffer,
    quantize_unorm,
)
from d3d12_deferred_renderer_tpu.ops.raster_ref import FragmentPlanes
from d3d12_deferred_renderer_tpu.scene import Materials


def _mats(albedo=(0.8, 0.2, 0.2), metal=0.0, rough=0.5):
    return Materials(
        albedo=jnp.asarray([albedo], jnp.float32),
        metalness=jnp.asarray([metal], jnp.float32),
        roughness=jnp.asarray([rough], jnp.float32),
    )


def _frags(h=4, w=4, normal=(0.0, 0.0, 1.0), covered=True):
    mid = jnp.full((h, w), 0 if covered else -1, jnp.int32)
    return FragmentPlanes(
        depth=jnp.full((h, w), 0.5 if covered else 1.0, jnp.float32),
        normal=jnp.tile(jnp.asarray(normal, jnp.float32), (h, w, 1)),
        uv=jnp.zeros((h, w, 2), jnp.float32),
        mesh_id=mid,
    )


def test_quantize_unorm_grid():
    x = jnp.asarray([0.0, 0.5, 1.0, 1.5, -0.2])
    q8 = np.asarray(quantize_unorm(x, 8))
    assert set(np.round(q8 * 255).astype(int)) <= set(range(256))
    np.testing.assert_allclose(q8, [0.0, 128 / 255, 1.0, 1.0, 0.0])


def test_gb0_values_on_8bit_grid():
    cfg = RendererConfig(quantize_gbuffer=True)
    gb = encode_gbuffer(_frags(), _mats(), cfg)
    v = np.asarray(gb.gb0) * 255.0
    np.testing.assert_allclose(v, np.round(v), atol=1e-4)
    # albedo 0.8 -> 204/255
    np.testing.assert_allclose(np.asarray(gb.gb0)[0, 0, 0], 204 / 255, atol=1e-6)


def test_gb1_roughness_two_bits():
    """R10G10B10A2: roughness 0.5 quantizes to 2/3 in the alpha channel — an exact
    reference parity detail (unused by Lambert but stored)."""
    cfg = RendererConfig(quantize_gbuffer=True)
    gb = encode_gbuffer(_frags(), _mats(rough=0.5), cfg)
    np.testing.assert_allclose(np.asarray(gb.gb1)[..., 3], 2 / 3, atol=1e-6)


def test_normal_encode_decode_roundtrip():
    cfg = RendererConfig(quantize_gbuffer=True)
    n = np.asarray([0.36, -0.48, 0.8], np.float32)
    gb = encode_gbuffer(_frags(normal=tuple(n)), _mats(), cfg)
    d = decode_gbuffer(gb, cfg)
    got = np.asarray(d.normal)[0, 0]
    assert np.linalg.norm(got) == 1.0 or abs(np.linalg.norm(got) - 1.0) < 1e-6
    np.testing.assert_allclose(got, n / np.linalg.norm(n), atol=2.5 / 1023)


def test_unnormalized_interpolant_renormalized():
    """geometry.hlsl:48 normalizes the interpolated normal before encoding."""
    cfg = RendererConfig(quantize_gbuffer=False)
    gb = encode_gbuffer(_frags(normal=(0.0, 0.0, 7.0)), _mats(), cfg)
    np.testing.assert_allclose(np.asarray(gb.gb1)[0, 0, :3], [0.5, 0.5, 1.0], atol=1e-6)


def test_background_cleared_to_zero():
    cfg = RendererConfig(quantize_gbuffer=True)
    gb = encode_gbuffer(_frags(covered=False), _mats(), cfg)
    assert np.asarray(gb.gb0).max() == 0.0
    assert np.asarray(gb.gb1).max() == 0.0
    assert np.asarray(gb.depth).min() == 1.0


def test_albedo_srgb_decode():
    cfg = RendererConfig(quantize_gbuffer=True)
    gb = encode_gbuffer(_frags(), _mats(albedo=(0.8, 0.2, 0.2)), cfg)
    d = decode_gbuffer(gb, cfg)
    np.testing.assert_allclose(
        np.asarray(d.albedo)[0, 0, 0], (204 / 255) ** 2.2, rtol=1e-5
    )

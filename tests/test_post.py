"""Post-processing tests: tonemap, gamma, bloom, FXAA, uint8 quantization."""
import jax.numpy as jnp
import numpy as np

from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops import post


def test_reinhard_range_and_monotonic():
    x = jnp.asarray([0.0, 0.5, 1.0, 4.0, 100.0])
    y = np.asarray(post.reinhard(x))
    assert (y >= 0).all() and (y < 1).all()
    assert (np.diff(y) > 0).all()
    np.testing.assert_allclose(y[2], 0.5)


def test_gamma_encode():
    np.testing.assert_allclose(
        np.asarray(post.gamma_encode(jnp.asarray([0.0, 1.0]))), [0.0, 1.0]
    )
    mid = float(post.gamma_encode(jnp.asarray(0.5)))
    assert 0.7 < mid < 0.75  # 0.5^(1/2.2) ~ 0.7297


def test_to_uint8_rounding():
    c = jnp.asarray([[-0.1, 0.0, 0.5], [1.0, 2.0, 128.4 / 255.0]])
    out = np.asarray(post.to_uint8(c))
    np.testing.assert_array_equal(out, [[0, 0, 128], [255, 255, 128]])


def test_bloom_brightens_highlights_only():
    hdr = np.zeros((64, 64, 3), np.float32)
    hdr[32, 32] = 8.0  # one bright emitter
    out = np.asarray(post.bloom(jnp.asarray(hdr), threshold=1.0, strength=0.5))
    assert out[32, 32, 0] >= 8.0
    # Glow falls off with distance from the emitter.
    near = out[30, 30].sum()
    far = out[0, 0].sum()
    assert near > 0.0
    assert far < near * 0.05


def test_bloom_noop_below_threshold():
    hdr = jnp.full((16, 16, 3), 0.5)
    out = np.asarray(post.bloom(hdr, threshold=1.0, strength=0.5))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_fxaa_smooths_edge_preserves_flat():
    img = np.zeros((16, 16, 3), np.float32)
    img[:, 8:] = 1.0  # vertical hard edge
    out = np.asarray(post.fxaa(jnp.asarray(img)))
    # Some intermediate values appear along the edge...
    edge_vals = out[4, 6:10, 0]
    assert ((edge_vals > 0.01) & (edge_vals < 0.99)).any()
    # ...but flat interior regions are untouched.
    np.testing.assert_allclose(out[:, :4], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, 12:], 1.0, atol=1e-6)


def test_apply_post_parity_mode_is_pure_gamma():
    cfg = RendererConfig(tonemap="none", bloom=False, fxaa=False)
    hdr = jnp.asarray(np.random.default_rng(0).uniform(0, 2, (8, 8, 3)).astype(np.float32))
    out = np.asarray(post.apply_post(hdr, cfg))
    np.testing.assert_allclose(out, np.asarray(post.gamma_encode(hdr)), atol=1e-7)

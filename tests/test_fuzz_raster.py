"""Randomized rasterizer agreement: Pallas (interpret) vs the pure-XLA oracle on
random triangle soups, including degenerate/offscreen/near-plane cases."""
import numpy as np
import pytest

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_binned
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed
from d3d12_deferred_renderer_tpu.ops.transform import triangle_setup

import jax.numpy as jnp


def random_clip_soup(seed, n=60):
    """Random clip-space triangles, some behind/straddling the near plane, some
    degenerate, some offscreen."""
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-1.6, 1.6, (3 * n, 4)).astype(np.float32)
    verts[:, 2] = rng.uniform(-0.4, 1.4, 3 * n)  # clip z, some < 0
    verts[:, 3] = rng.uniform(0.3, 2.5, 3 * n)   # w > 0
    verts[:, 0] *= verts[:, 3]
    verts[:, 1] *= verts[:, 3]
    verts[:, 2] = np.minimum(verts[:, 2], 1.0) * verts[:, 3]
    # A few exactly-degenerate triangles.
    for k in range(0, 9, 3):
        verts[k + 1] = verts[k]
    normals = rng.normal(size=(3 * n, 3)).astype(np.float32)
    uvs = rng.uniform(0, 1, (3 * n, 2)).astype(np.float32)
    mesh_ids = rng.integers(0, 5, n).astype(np.int32)
    return verts, normals, uvs, mesh_ids


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_pallas_matches_reference(seed):
    cfg = RendererConfig(width=128, height=64, tile_h=8, tile_w=128,
                         max_tris_per_tile=256)
    verts, normals, uvs, mesh_ids = random_clip_soup(seed)
    n = mesh_ids.shape[0]
    tris = triangle_setup(
        jnp.asarray(verts), jnp.asarray(normals), jnp.asarray(uvs),
        jnp.arange(3 * n), jnp.asarray(mesh_ids), cfg, cull="none",
    )
    ref = rasterize_packed(tris.packed, cfg.height, cfg.width)
    pal = rasterize_binned(tris.packed, tris.aabb, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(pal.mesh_id), np.asarray(ref.mesh_id))
    np.testing.assert_allclose(np.asarray(pal.depth), np.asarray(ref.depth), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pal.normal), np.asarray(ref.normal),
                               atol=1e-4, rtol=1e-4)
    # Sanity: the soup actually covered something.
    assert (np.asarray(ref.mesh_id) >= 0).any()

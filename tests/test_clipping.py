"""Near-plane clipping tests: geometry crossing or behind the near plane."""
import dataclasses

import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed
from d3d12_deferred_renderer_tpu.ops.transform import (
    _clip_near_plane,
    setup_frame_triangles,
    triangle_setup,
)


def _packed_coverage(state, cfg):
    tris, _ = setup_frame_triangles(state, cfg)
    frags = rasterize_packed(tris.packed, cfg.height, cfg.width)
    return np.asarray(frags.mesh_id)


def test_plane_extending_behind_camera_is_visible():
    """A huge ground plane spans past the camera (z < eye z): without near clipping
    both its triangles would be rejected; with clipping the visible part renders."""
    cfg = RendererConfig(width=160, height=96, use_pallas=False)
    geo = dxr.build_scene_geometry([dxr.procedural.ground_plane(size=40.0, y=-1.0)])
    state = dxr.make_scene(geo, cfg)
    state = dataclasses.replace(state, position=jnp.zeros((1, 3), jnp.float32))
    mid = _packed_coverage(state, cfg)
    # Ground fills a large part of the lower screen.
    assert (mid == 0).sum() > 0.25 * mid.size


def test_clip_counts():
    """_clip_near_plane emits exactly 2 slots per tri with correct degeneracy."""
    # z values: fully inside / fully outside / one in / two in.
    def tri(z0, z1, z2):
        c = np.zeros((3, 4), np.float32)
        c[:, 0] = [0.0, 1.0, 0.0]
        c[:, 1] = [0.0, 0.0, 1.0]
        c[:, 2] = [z0, z1, z2]
        c[:, 3] = 1.0
        return c

    c = jnp.asarray(
        np.stack([tri(0.5, 0.5, 0.5), tri(-1, -1, -1), tri(0.5, -1, -1), tri(0.5, 0.5, -1)])
    )
    n = jnp.zeros((4, 3, 3))
    uv = jnp.zeros((4, 3, 2))
    c2, n2, uv2, duplicate = _clip_near_plane(c, n, uv)
    assert c2.shape == (8, 3, 4)
    np.testing.assert_array_equal(
        np.asarray(duplicate(jnp.arange(4))), [0, 0, 1, 1, 2, 2, 3, 3]
    )

    def area3d_degenerate(t):  # all three vertices identical?
        return np.allclose(t[0], t[1]) and np.allclose(t[0], t[2])

    c2 = np.asarray(c2)
    assert not area3d_degenerate(c2[0]) and area3d_degenerate(c2[1])  # inside
    assert area3d_degenerate(c2[2]) and area3d_degenerate(c2[3])      # outside
    assert not area3d_degenerate(c2[4]) and area3d_degenerate(c2[5])  # 1 in -> 1 tri
    assert not area3d_degenerate(c2[6]) and not area3d_degenerate(c2[7])  # 2 in -> quad
    # All NON-degenerate output vertices lie on or inside the near plane
    # (degenerate slots are zero-area and rejected downstream regardless).
    for t in [0, 4, 6, 7]:
        assert (c2[t, :, 2] >= -1e-6).all()


def test_clip_interpolates_exactly_at_plane():
    c = jnp.asarray(
        [[[0.0, 0.0, 1.0, 2.0], [1.0, 0.0, -1.0, 0.5], [0.0, 1.0, -1.0, 0.5]]],
        jnp.float32,
    )
    n = jnp.asarray([[[1, 0, 0], [0, 1, 0], [0, 0, 1]]], jnp.float32)
    uv = jnp.zeros((1, 3, 2))
    c2, n2, _, _ = _clip_near_plane(c, n, uv)
    tri = np.asarray(c2[0])
    # Intersections at t = 1/(1-(-1)) = 0.5 along both edges.
    np.testing.assert_allclose(tri[1], [0.5, 0.0, 0.0, 1.25], atol=1e-6)
    np.testing.assert_allclose(tri[2], [0.0, 0.5, 0.0, 1.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n2[0])[1], [0.5, 0.5, 0.0], atol=1e-6)


def test_winding_preserved_through_clip():
    """A front-facing triangle clipped by the near plane stays front-facing."""
    cfg = RendererConfig(width=64, height=64, use_pallas=False)
    # Front-facing tri (CCW y-up in clip space), one vertex pushed behind near.
    clip = jnp.asarray(
        [
            [-0.5, -0.5, 0.5, 1.0],
            [0.5, -0.5, 0.5, 1.0],
            [0.0, 0.5, -0.5, 1.0],  # behind near plane
        ],
        jnp.float32,
    )
    tris = triangle_setup(
        clip, jnp.zeros((3, 3)), jnp.zeros((3, 2)), jnp.asarray([0, 1, 2]),
        jnp.zeros((1,), jnp.int32), cfg,
    )
    assert bool(np.asarray(tris.valid).any())  # clipped remainder survives culling


def test_clip_near_plane_depth_only_none_attrs():
    """The row-shape clip entry point must honor the documented depth-only
    contract (n/uv may be None) and produce the same positions as the
    with-attributes call."""
    from d3d12_deferred_renderer_tpu.ops.transform import _clip_near_plane

    c = jnp.asarray(
        [
            [[0.0, 0.0, -0.5, 1.0], [1.0, 0.0, 0.5, 1.0], [0.0, 1.0, 0.5, 1.0]],
            [[-1.0, 0.0, 0.2, 1.0], [1.0, 0.0, 0.3, 1.0], [0.0, 1.0, 0.4, 1.0]],
        ],
        jnp.float32,
    )
    n = jnp.zeros((2, 3, 3), jnp.float32).at[..., 2].set(1.0)
    uv = jnp.zeros((2, 3, 2), jnp.float32)

    c_only, n_none, uv_none, _ = _clip_near_plane(c, None, None)
    c_full, _, _, _ = _clip_near_plane(c, n, uv)
    assert n_none is None and uv_none is None
    np.testing.assert_array_equal(np.asarray(c_only), np.asarray(c_full))

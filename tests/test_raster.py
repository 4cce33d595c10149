"""Rasterizer rule tests: coverage, fill rule, depth test, culling, interpolation.

These pin the D3D semantics (SURVEY.md §4): pixel-center sampling, top-left rule,
depth LESS, back-face culling with FrontCounterClockwise=TRUE, and perspective-
correct attribute interpolation.
"""
import jax.numpy as jnp
import numpy as np

from d3d12_deferred_renderer_tpu.config import RendererConfig
from d3d12_deferred_renderer_tpu.ops import transform as T
from d3d12_deferred_renderer_tpu.ops.raster_ref import rasterize_packed


def make_packed(tris, height=16, width=16):
    """Build packed records from screen-space triangles.

    tris: list of dicts with keys 'xy' [3,2], optional 'z' [3], 'rw' [3],
    'n' [3,3], 'uv' [3,2], 'mesh_id'.
    """
    out = np.zeros((len(tris), T.TRI_STRIDE), np.float32)
    for i, t in enumerate(tris):
        xy = np.asarray(t["xy"], np.float32)
        z = np.asarray(t.get("z", [0.5, 0.5, 0.5]), np.float32)
        rw = np.asarray(t.get("rw", [1.0, 1.0, 1.0]), np.float32)
        n = np.asarray(t.get("n", [[0, 0, 1]] * 3), np.float32)
        uv = np.asarray(t.get("uv", [[0, 0]] * 3), np.float32)
        area2 = (xy[1, 0] - xy[0, 0]) * (xy[2, 1] - xy[0, 1]) - (
            xy[1, 1] - xy[0, 1]
        ) * (xy[2, 0] - xy[0, 0])
        if area2 < 0:  # canonicalize like triangle_setup does
            xy[[1, 2]] = xy[[2, 1]]
            z[[1, 2]] = z[[2, 1]]
            rw[[1, 2]] = rw[[2, 1]]
            n[[1, 2]] = n[[2, 1]]
            uv[[1, 2]] = uv[[2, 1]]
            area2 = -area2
        out[i, [T.TRI_X0, T.TRI_X1, T.TRI_X2]] = xy[:, 0]
        out[i, [T.TRI_Y0, T.TRI_Y1, T.TRI_Y2]] = xy[:, 1]
        out[i, [T.TRI_Z0, T.TRI_Z1, T.TRI_Z2]] = z
        out[i, [T.TRI_RW0, T.TRI_RW1, T.TRI_RW2]] = rw
        out[i, T.TRI_N0 : T.TRI_N0 + 3] = n[0] * rw[0]
        out[i, T.TRI_N1 : T.TRI_N1 + 3] = n[1] * rw[1]
        out[i, T.TRI_N2 : T.TRI_N2 + 3] = n[2] * rw[2]
        out[i, T.TRI_UV0 : T.TRI_UV0 + 2] = uv[0] * rw[0]
        out[i, T.TRI_UV1 : T.TRI_UV1 + 2] = uv[1] * rw[1]
        out[i, T.TRI_UV2 : T.TRI_UV2 + 2] = uv[2] * rw[2]
        out[i, T.TRI_MESH_ID] = t.get("mesh_id", 0)
        out[i, T.TRI_VALID] = 1.0
        out[i, T.TRI_AREA] = area2
    return jnp.asarray(out)


def test_pixel_center_coverage():
    """An axis-aligned right triangle covering exactly the lower-left half of a
    4x4 pixel box, with integer edges: the diagonal pixels follow the fill rule."""
    packed = make_packed([{"xy": [(0, 0), (4, 0), (0, 4)]}])
    frags = rasterize_packed(packed, 8, 8)
    cov = np.asarray(frags.mesh_id >= 0)
    # Pixel centers at (x+0.5, y+0.5); inside iff x+y+1 < 4 (strict: diagonal is
    # neither top nor left for this winding... check exact count).
    expect = np.zeros((8, 8), bool)
    for y in range(8):
        for x in range(8):
            px, py = x + 0.5, y + 0.5
            # edges: (0,0)->(4,0) is a TOP edge (y=0, interior below);
            # (0,0)->(0,4) is a LEFT edge; diagonal is neither.
            e_top = py > 0
            e_left = px > 0
            e_diag = px + py < 4  # strictly inside of hypotenuse
            expect[y, x] = e_top and e_left and e_diag
    np.testing.assert_array_equal(cov, expect)


def test_top_left_rule_on_top_and_left_edges():
    """Pixel centers exactly ON a top or left edge are covered."""
    # Triangle with top edge along y = 0.5 (pixel-center row) and left edge x = 0.5.
    packed = make_packed([{"xy": [(0.5, 0.5), (6.5, 0.5), (0.5, 6.5)]}])
    frags = rasterize_packed(packed, 8, 8)
    cov = np.asarray(frags.mesh_id >= 0)
    assert cov[0, 0]  # (0.5, 0.5) lies on both top and left edges -> covered
    assert cov[0, 3]  # on the top edge
    assert cov[3, 0]  # on the left edge


def test_shared_edge_no_double_coverage():
    """Two triangles sharing a diagonal: every pixel of the quad is covered exactly
    once (watertight rasterization — D3D guarantee via the fill rule)."""
    quad = [(1, 1), (13, 1), (13, 13), (1, 13)]
    t0 = {"xy": [quad[0], quad[1], quad[2]], "mesh_id": 0, "z": [0.5] * 3}
    t1 = {"xy": [quad[0], quad[2], quad[3]], "mesh_id": 1, "z": [0.5] * 3}
    f_both = rasterize_packed(make_packed([t0, t1]), 16, 16)
    cov_both = np.asarray(f_both.mesh_id >= 0)

    f0 = rasterize_packed(make_packed([t0]), 16, 16)
    f1 = rasterize_packed(make_packed([t1]), 16, 16)
    c0 = np.asarray(f0.mesh_id >= 0)
    c1 = np.asarray(f1.mesh_id >= 0)

    # No overlap, no gap: individually-rasterized halves partition the quad.
    assert not (c0 & c1).any(), "shared edge rasterized twice"
    expect = np.zeros((16, 16), bool)
    expect[1:13, 1:13] = True  # centers strictly inside the quad (+ top/left edges)
    np.testing.assert_array_equal(c0 | c1, expect)
    np.testing.assert_array_equal(cov_both, expect)


def test_depth_less_nearer_wins_either_order():
    near = {"xy": [(0, 0), (16, 0), (0, 16)], "z": [0.3] * 3, "mesh_id": 1}
    far = {"xy": [(0, 0), (16, 0), (0, 16)], "z": [0.7] * 3, "mesh_id": 2}
    for order in ([near, far], [far, near]):
        frags = rasterize_packed(make_packed(order), 8, 8)
        mid = np.asarray(frags.mesh_id)
        assert (mid[mid >= 0] == 1).all()
        d = np.asarray(frags.depth)
        np.testing.assert_allclose(d[mid >= 0], 0.3)


def test_depth_equal_first_wins():
    """LESS (not LESS_EQUAL): equal depth keeps the earlier fragment (main.cpp:763)."""
    a = {"xy": [(0, 0), (16, 0), (0, 16)], "z": [0.5] * 3, "mesh_id": 1}
    b = {"xy": [(0, 0), (16, 0), (0, 16)], "z": [0.5] * 3, "mesh_id": 2}
    frags = rasterize_packed(make_packed([a, b]), 8, 8)
    mid = np.asarray(frags.mesh_id)
    assert (mid[mid >= 0] == 1).all()


def test_depth_clip():
    """Fragments with z outside [0, 1] are clipped (DepthClipEnable, main.cpp:735)."""
    t = {"xy": [(0, 0), (16, 0), (0, 16)], "z": [-0.5, -0.5, 2.0]}
    frags = rasterize_packed(make_packed([t]), 8, 8)
    d = np.asarray(frags.depth)
    cov = np.asarray(frags.mesh_id >= 0)
    assert (d[cov] >= 0).all() and (d[cov] <= 1).all()
    assert not cov.all()  # some pixels clipped away
    assert cov.any()      # but the in-range band survives


def test_backface_cull_through_setup():
    """Facing is decided by screen-space winding: with FrontCounterClockwise=TRUE
    (main.cpp:728), clip-space CCW (y-up) triangles are front-facing."""
    cfg = RendererConfig(width=16, height=16, use_pallas=False)
    # NDC triangle, y-up CCW: (-0.5,-0.5) -> (0.5,-0.5) -> (0,0.5).
    clip = jnp.asarray(
        [[-0.5, -0.5, 0.5, 1.0], [0.5, -0.5, 0.5, 1.0], [0.0, 0.5, 0.5, 1.0]],
        jnp.float32,
    )
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (3, 1))
    uvs = jnp.zeros((3, 2))
    mesh_id = jnp.zeros((1,), jnp.int32)

    fwd = T.triangle_setup(clip, normals, uvs, jnp.asarray([0, 1, 2]), mesh_id, cfg)
    rev = T.triangle_setup(clip, normals, uvs, jnp.asarray([0, 2, 1]), mesh_id, cfg)
    # Clip-space CCW (y-up) is *visually* CCW on the display too (the viewport's
    # y-flip and the display's y-down convention cancel) -> front-facing -> kept;
    # the reversed winding is back-facing -> culled.
    assert bool(fwd.valid[0])
    assert not bool(rev.valid[0])
    # cull='none' keeps both; cull='front' culls the front-facing one.
    assert bool(T.triangle_setup(clip, normals, uvs, jnp.asarray([0, 2, 1]), mesh_id, cfg, cull="none").valid[0])
    assert not bool(T.triangle_setup(clip, normals, uvs, jnp.asarray([0, 1, 2]), mesh_id, cfg, cull="front").valid[0])


def test_degenerate_triangle_rejected():
    cfg = RendererConfig(width=16, height=16)
    clip = jnp.asarray(
        [[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 0.5, 1.0], [1.0, 0.0, 0.5, 1.0]],
        jnp.float32,
    )  # collinear
    tris = T.triangle_setup(
        clip, jnp.zeros((3, 3)), jnp.zeros((3, 2)), jnp.asarray([0, 1, 2]),
        jnp.zeros((1,), jnp.int32), cfg, cull="none",
    )
    assert not bool(tris.valid[0])


def test_behind_camera_rejected():
    cfg = RendererConfig(width=16, height=16)
    clip = jnp.asarray(
        [[0.0, 0.0, 0.5, 1.0], [0.5, 0.0, 0.5, 1.0], [0.0, 0.5, -0.5, -1.0]],
        jnp.float32,
    )
    tris = T.triangle_setup(
        clip, jnp.zeros((3, 3)), jnp.zeros((3, 2)), jnp.asarray([0, 1, 2]),
        jnp.zeros((1,), jnp.int32), cfg, cull="none",
    )
    assert not bool(tris.valid[0])


def test_perspective_correct_interpolation():
    """A triangle with w=1 and w=3 endpoints: the uv at a screen midpoint must be
    the perspective-correct value, not the screen-linear one."""
    # Vertical-edge triangle so the horizontal midpoint math is exact.
    t = {
        "xy": [(0, 0), (16, 0), (0, 16)],
        "z": [0.5, 0.5, 0.5],
        "rw": [1.0, 1.0 / 3.0, 1.0],  # w: 1, 3, 1
        "uv": [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
    }
    frags = rasterize_packed(make_packed([t]), 16, 16)
    uv = np.asarray(frags.uv)
    # Sample pixel (8, 0) center (8.5, 0.5): barycentric along top edge
    # b1 = 8.5/16 = 0.53125.  Screen-linear u would be 0.53125; perspective-correct
    # u = (b1 * u1/w1) / (b0/w0 + b1/w1).
    b1 = 8.5 / 16.0
    b0 = 1 - b1 - (0.5 / 16.0)
    b2 = 0.5 / 16.0
    rw = b0 * 1.0 + b1 / 3.0 + b2 * 1.0
    expect_u = (b1 * (1.0 / 3.0)) / rw
    got = uv[0, 8, 0]
    np.testing.assert_allclose(got, expect_u, rtol=1e-5)
    assert abs(got - b1) > 0.05  # meaningfully different from screen-linear

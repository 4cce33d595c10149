"""DirectXMath-parity tests for the math layer (SURVEY.md §7 hard-part #3).

These lock in the left-handed conventions of main.cpp:213-228 / 368-375 and the
row-vector HLSL consumption (geometry.hlsl:32-37).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from d3d12_deferred_renderer_tpu import xmath


def test_look_at_lh_maps_eye_to_origin():
    m = xmath.look_at_lh((0.0, 1.0, -8.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    p = xmath.transform_points(jnp.asarray([0.0, 1.0, -8.0]), m)
    np.testing.assert_allclose(np.asarray(p[:3]), 0.0, atol=1e-6)


def test_look_at_lh_at_on_positive_z():
    eye = (0.0, 1.0, -8.0)
    m = xmath.look_at_lh(eye, (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    p = np.asarray(xmath.transform_points(jnp.asarray([0.0, 0.0, 0.0]), m))
    # LH: the look target lands on the +z axis at distance |at - eye|.
    dist = np.linalg.norm(np.asarray(eye))
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-6)
    np.testing.assert_allclose(p[2], dist, rtol=1e-6)
    assert p[3] == pytest.approx(1.0)


def test_look_at_lh_up_has_positive_y():
    m = xmath.look_at_lh((0.0, 1.0, -8.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    v = np.asarray(xmath.transform_vectors(jnp.asarray([0.0, 1.0, 0.0]), m))
    assert v[1] > 0.9  # world up maps close to view up


def test_look_at_lh_is_rigid():
    m = np.asarray(
        xmath.look_at_lh((3.0, -2.0, 5.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    )
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)


def test_perspective_fov_lh_depth_range():
    zn, zf = 0.1, 100.0
    m = xmath.perspective_fov_lh(xmath.XM_PIDIV4, 16 / 9, zn, zf)
    for z_view, expect in [(zn, 0.0), (zf, 1.0)]:
        clip = np.asarray(
            xmath.transform_points(jnp.asarray([0.0, 0.0, z_view]), m)
        )
        assert clip[3] == pytest.approx(z_view, rel=1e-6)  # w = view z
        assert clip[2] / clip[3] == pytest.approx(expect, abs=1e-5)


def test_perspective_fov_lh_fov_scaling():
    # At fov/2 elevation and unit aspect, |y/w| == 1 (edge of the frustum).
    fov = xmath.XM_PIDIV4
    m = xmath.perspective_fov_lh(fov, 1.0, 0.1, 100.0)
    y = np.tan(fov / 2) * 5.0
    clip = np.asarray(xmath.transform_points(jnp.asarray([0.0, y, 5.0]), m))
    assert clip[1] / clip[3] == pytest.approx(1.0, rel=1e-5)


def test_rotation_composition_order():
    """XMMatrixRotationRollPitchYaw applies roll (z) first, then pitch (x), then
    yaw (y) — row-vector: M = Rz @ Rx @ Ry."""
    p, y, r = 0.3, 1.1, -0.7
    m = np.asarray(xmath.rotation_roll_pitch_yaw(p, y, r))
    mz = np.asarray(xmath.rotation_roll_pitch_yaw(0.0, 0.0, r))
    mx = np.asarray(xmath.rotation_roll_pitch_yaw(p, 0.0, 0.0))
    my = np.asarray(xmath.rotation_roll_pitch_yaw(0.0, y, 0.0))
    np.testing.assert_allclose(m, mz @ mx @ my, atol=1e-6)


def test_yaw_rotates_x_toward_negative_z():
    """LH y-up: positive yaw (about +y) takes +x toward -z (row-vector Ry)."""
    m = xmath.rotation_roll_pitch_yaw(0.0, np.pi / 2, 0.0)
    v = np.asarray(xmath.transform_vectors(jnp.asarray([1.0, 0.0, 0.0]), m))
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-6)


def test_model_matrix_srt_order():
    """S @ R @ T: scale first, then rotate, then translate (main.cpp:374)."""
    m = xmath.model_matrix(
        jnp.asarray([1.0, 2.0, 3.0]),      # translation
        jnp.asarray([0.0, np.pi / 2, 0.0]),  # yaw 90deg
        jnp.asarray([2.0, 2.0, 2.0]),      # scale
    )
    p = np.asarray(xmath.transform_points(jnp.asarray([1.0, 0.0, 0.0]), m))
    # (1,0,0) -> scale -> (2,0,0) -> yaw -> (0,0,-2) -> translate -> (1,2,1)
    np.testing.assert_allclose(p[:3], [1.0, 2.0, 1.0], atol=1e-5)


def test_model_matrix_batched():
    pos = jnp.zeros((5, 3))
    orient = jnp.zeros((5, 3))
    scale = jnp.ones((5, 3))
    m = xmath.model_matrix(pos, orient, scale)
    assert m.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(m), np.broadcast_to(np.eye(4), (5, 4, 4)), atol=1e-6)


def test_normal_transform_no_inverse_transpose_quirk():
    """geometry.hlsl:37 transforms normals with the model matrix itself; under
    nonuniform scale the result is NOT unit length — preserved quirk."""
    m = xmath.model_matrix(
        jnp.zeros(3), jnp.zeros(3), jnp.asarray([2.0, 1.0, 1.0])
    )
    n = np.asarray(xmath.transform_vectors(jnp.asarray([1.0, 0.0, 0.0]), m))
    np.testing.assert_allclose(n, [2.0, 0.0, 0.0], atol=1e-6)


def test_perspective_constants_use_f32_chain():
    """XMMatrixPerspectiveFovLH computes fRange = zf/(zf-zn) in float32; a
    float64-then-cast evaluation diverges by 1 ulp for many (zn, zf) pairs
    (the default 0.1/100 coincides).  Pin the f32 chain."""
    for zn, zf in [(0.37, 250.0), (0.5, 77.0), (1.0, 1000.0), (0.1, 100.0),
                   (0.25, 333.0), (2.0, 10000.0)]:
        m = np.asarray(xmath.perspective_fov_lh(np.pi / 4, 16 / 9, zn, zf))
        f_zn, f_zf = np.float32(zn), np.float32(zf)
        f_range = f_zf / (f_zf - f_zn)
        assert m[2, 2] == f_range, (zn, zf)
        assert m[3, 2] == np.float32(-(f_range * f_zn)), (zn, zf)

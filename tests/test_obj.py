"""OBJ loader + unified scene layout tests (reference semantics: main.cpp:916-1045)."""
import os

import numpy as np
import pytest

from d3d12_deferred_renderer_tpu.models import build_scene_geometry, load_obj
from d3d12_deferred_renderer_tpu.models.obj import load_obj_python

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")


def test_cube_dedup_counts():
    """cube.obj: 36 face-vertices dedup to exactly 24 unique (v,vn) pairs."""
    mesh = load_obj_python(os.path.join(ASSETS, "cube.obj"))
    assert mesh.num_vertices == 24
    assert mesh.indices.shape == (36,)
    assert mesh.num_triangles == 12
    assert mesh.indices.max() == 23


def test_pyramid_dedup_counts():
    """pyramid.obj: 4 side faces (3 unique each) + base (4 unique) = 16."""
    mesh = load_obj_python(os.path.join(ASSETS, "pyramid.obj"))
    assert mesh.num_vertices == 16
    assert mesh.indices.shape == (18,)


def test_dedup_reuses_exact_triples(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
        "f 1//1 2//1 3//1\nf 1//1 3//1 2//1\n"  # same triples, reused
    )
    mesh = load_obj_python(str(p))
    assert mesh.num_vertices == 3
    assert list(mesh.indices) == [0, 1, 2, 0, 2, 1]


def test_same_position_different_normal_not_deduped(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nvn 0 1 0\n"
        "f 1//1 2//1 3//1\nf 1//2 2//2 3//2\n"
    )
    mesh = load_obj_python(str(p))
    assert mesh.num_vertices == 6


def test_polygon_fan_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    mesh = load_obj_python(str(p))
    assert mesh.num_triangles == 2
    assert list(mesh.indices) == [0, 1, 2, 0, 2, 3]


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    mesh = load_obj_python(str(p))
    assert mesh.num_vertices == 3
    np.testing.assert_allclose(mesh.positions[1], [1, 0, 0])


def test_v_vt_vn_parsing(tmp_path):
    p = tmp_path / "full.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.5 0.25\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1\n"
    )
    mesh = load_obj_python(str(p))
    np.testing.assert_allclose(mesh.uvs[0], [0.5, 0.25])
    np.testing.assert_allclose(mesh.normals[0], [0, 0, 1])


def test_flat_normal_generation(tmp_path):
    """OBJ without vn: faceted normals are generated, outward-oriented."""
    p = tmp_path / "nonorm.obj"
    # Unit quad in the xy plane wound CCW viewed from +z... two triangles.
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3\nf 1 3 4\n")
    mesh = load_obj(str(p), prefer_native=False)
    assert mesh.num_triangles == 2
    assert mesh.num_vertices == 6  # faceted re-mesh: 3 verts per triangle
    n = mesh.normals
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)  # +-z face normal
    # All faces of one planar quad agree.
    assert len(np.unique(np.round(n, 5), axis=0)) == 1


def test_flat_normals_outward_on_cube(tmp_path):
    """Winding-derived normals on a closed CCW-from-outside cube point outward."""
    from d3d12_deferred_renderer_tpu.models import procedural

    cube = procedural.cube(1.0)
    stripped = cube.__class__(
        positions=cube.positions,
        normals=np.zeros_like(cube.normals),
        uvs=cube.uvs,
        indices=cube.indices,
        name="cube",
    )
    flat = stripped.with_flat_normals()
    idx = flat.indices.reshape(-1, 3)
    centroids = flat.positions[idx].mean(axis=1)
    n = flat.normals[idx[:, 0]]
    # Outward: normal agrees with centroid direction from the cube center.
    dots = np.sum(n * centroids, axis=-1)
    assert (dots > 0).all()
    # And matches the authored face normals.
    np.testing.assert_allclose(n, cube.normals[cube.indices.reshape(-1, 3)[:, 0]], atol=1e-6)


def test_mesh_has_normals_flag():
    mesh = load_obj_python(os.path.join(ASSETS, "cube.obj"))
    assert mesh.has_normals


def test_missing_file_fails_fast():
    with pytest.raises(FileNotFoundError):
        load_obj(os.path.join(ASSETS, "bunny.obj"))  # the reference's missing asset


def test_unified_buffers():
    cube = load_obj_python(os.path.join(ASSETS, "cube.obj"))
    pyr = load_obj_python(os.path.join(ASSETS, "pyramid.obj"))
    geo = build_scene_geometry([cube, pyr])
    assert geo.num_meshes == 2
    assert geo.num_vertices == 24 + 16
    assert geo.indices.shape == (36 + 18,)
    # Globalized indices: pyramid's indices offset by cube's vertex count.
    assert geo.indices[:36].max() == 23
    assert geo.indices[36:].min() >= 24
    np.testing.assert_array_equal(geo.vertex_offsets, [0, 24])
    np.testing.assert_array_equal(geo.index_offsets, [0, 36])
    assert list(geo.tri_mesh_id[:12]) == [0] * 12
    assert list(geo.tri_mesh_id[12:]) == [1] * 6
    assert list(geo.vertex_mesh_id[:24]) == [0] * 24


def test_partial_normals_get_generated(tmp_path):
    """A mesh with vn on only SOME faces (mixed exporters) must still receive
    generated normals — np.any over all normals used to classify it as fully
    normal-equipped, leaving the bare faces' zero normals to shade black."""
    p = tmp_path / "partial.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vn 0 0 1\n"
        "f 1//1 2//1 3//1\n"   # carries a normal
        "f 2 4 3\n"            # bare -> zero normal without generation
    )
    mesh = load_obj(str(p), prefer_native=False)
    lengths = np.linalg.norm(mesh.normals[mesh.indices], axis=-1)
    assert (lengths > 0.99).all(), "some referenced vertex kept a zero normal"
    # And a fully-normal-equipped mesh is untouched (no faceting).
    cube = load_obj(os.path.join(ASSETS, "cube.obj"), prefer_native=False)
    assert cube.num_vertices == 24


def test_torus_uv_seams_monotonic():
    """Torus seam rings are duplicated (uv reaching 1.0) — modulo-shared seam
    vertices would interpolate uv backwards across the seam quads, smearing
    any uv-driven pattern into a band."""
    import d3d12_deferred_renderer_tpu.models.procedural as proc

    t = proc.torus(rings=8, sides=6)
    assert t.num_triangles == 2 * 8 * 6
    tris = t.uvs[t.indices.reshape(-1, 3)]  # [T, 3, 2]
    span = tris.max(axis=1) - tris.min(axis=1)
    # Every triangle's uv footprint is one cell, never ~the whole texture.
    assert span[:, 0].max() <= 1.0 / 8 + 1e-6
    assert span[:, 1].max() <= 1.0 / 6 + 1e-6

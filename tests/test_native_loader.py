"""Native C++ OBJ loader: bit-equality with the Python loader on every asset and
edge case."""
import os

import numpy as np
import pytest

from d3d12_deferred_renderer_tpu.models.native import (
    ensure_built,
    load_obj_native,
    native_available,
)
from d3d12_deferred_renderer_tpu.models.obj import load_obj_python

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets", "models")

pytestmark = pytest.mark.skipif(
    not ensure_built(), reason="native toolchain unavailable"
)


def _assert_equal(a, b):
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.normals, b.normals)
    np.testing.assert_array_equal(a.uvs, b.uvs)
    np.testing.assert_array_equal(a.indices, b.indices)


@pytest.mark.parametrize("name", ["cube.obj", "pyramid.obj"])
def test_native_matches_python_on_assets(name):
    path = os.path.join(ASSETS, name)
    _assert_equal(load_obj_native(path), load_obj_python(path))


def test_native_matches_python_edge_cases(tmp_path):
    p = tmp_path / "edge.obj"
    p.write_text(
        "# comment\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0.5 0.25\nvn 0 0 1\nvn 0 1 0\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"   # quad with full v/vt/vn -> fan
        "f -4//-1 -3//-1 -2//-1\n"      # negative indices, v//vn
        "f 1 2 3\n"                     # bare positions
    )
    _assert_equal(load_obj_native(str(p)), load_obj_python(str(p)))


def test_native_is_used_by_default():
    from d3d12_deferred_renderer_tpu.models import load_obj

    if native_available():
        mesh = load_obj(os.path.join(ASSETS, "cube.obj"))
        assert mesh.num_vertices == 24


def test_native_speed_on_large_mesh(tmp_path):
    """Generate a large OBJ and confirm both loaders agree (and native works at
    scale)."""
    import d3d12_deferred_renderer_tpu.models.procedural as proc

    sphere = proc.uv_sphere(1.0, 48, 96)
    lines = []
    for p in sphere.positions:
        lines.append(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}")
    for n in sphere.normals:
        lines.append(f"vn {n[0]:.6f} {n[1]:.6f} {n[2]:.6f}")
    idx = sphere.indices.reshape(-1, 3) + 1
    for t in idx:
        lines.append(f"f {t[0]}//{t[0]} {t[1]}//{t[1]} {t[2]}//{t[2]}")
    p = tmp_path / "big.obj"
    p.write_text("\n".join(lines))
    _assert_equal(load_obj_native(str(p)), load_obj_python(str(p)))

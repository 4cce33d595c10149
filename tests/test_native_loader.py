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


def test_degenerate_inputs_agree(tmp_path):
    """Both loaders must agree on malformed/degenerate OBJs: identical output,
    or both raising — never a hang, a silently dropped triangle, or a
    loader-dependent result (review findings: strtol no-conversion hang,
    whitespace-crossing token steal, forward-out-of-range divergence)."""
    cases = {
        # strtol makes no conversion -> used to spin forever in C.
        "junk_face": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf a b c\n",
        # Trailing slash: strtol used to skip the space and eat the next token.
        "trailing_slash": "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nf 1/ 2/ 3/1\n",
        # Forward out-of-range index: Python used to raise, native emitted zeros.
        "oob_forward": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 9 2 3\n",
        # Index 0 is invalid OBJ -> zeros in both.
        "zero_index": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 0 2 3\n",
        # Non-numeric floats must error, not parse garbage.
        "junk_floats": "v a b c\nf 1 2 3\n",
        # Short v-line: strtof used to swallow the next line's numbers.
        "short_vline": "v 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
        # Extra /-fields are ignored (Python split() leaves them unconverted).
        "extra_fields": (
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvn 0 0 1\n"
            "f 1/1/1/junk 2/1/1 3/1/1\n"
        ),
        # v//vn with empty middle field.
        "empty_middle": "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n",
        # Index magnitude past int64: Python's big int stays out of range and
        # emits zeros; the C parse must saturate (wrap was UB and could
        # resolve to a REAL vertex).
        "huge_index": (
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "f 18446744073709551615 2 3\nf -18446744073709551615 2 3\n"
        ),
        # \x0b/\x0c are split points for Python str.split(); the native
        # whitespace set must match (was space/tab/\r only).
        "vertical_tab_sep": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1\x0b2 3\n",
        "formfeed_lead": "\x0cv 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
        "formfeed_tag": "v\x0c0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
        # int() underscores / strtof hex floats are off the shared grammar:
        # BOTH loaders must reject (bare int('1_0') == 10 silently diverged;
        # strtof('0x1p3') == 8.0 silently diverged).
        "underscore_index": "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1_0 2 3\n",
        "hex_float": "v 0x1p3 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
        # Leading '+' on numbers is accepted by both grammars.
        "plus_signs": "v +1 +2.5 +3e0\nv 1 0 0\nv 0 1 0\nf +1 2 3\n",
        # inf/nan spellings parse identically (from_chars general format).
        "inf_nan": "v inf -Infinity nan\nv 1 0 0\nv 0 1 0\nf 1 2 3\n",
    }
    for name, text in cases.items():
        p = tmp_path / f"{name}.obj"
        p.write_text(text)
        results = []
        for fn in (load_obj_python, load_obj_native):
            try:
                results.append(fn(str(p)))
            except Exception:
                results.append(None)
        py, nat = results
        assert (py is None) == (nat is None), name
        if py is not None:
            _assert_equal(nat, py)


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

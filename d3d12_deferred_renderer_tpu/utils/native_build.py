"""Shared build-or-locate helper for the native C++ components (native/*.cpp).

Both ctypes bindings (models/native.py — OBJ loader; runtime/native_sink.py —
frame sink) need the same rule: use the shared library if it exists AND is at
least as new as its source, otherwise rebuild via the native/ Makefile.  The
mtime check matters — a stale .so silently shadowing an edited .cpp would break
the loaders' asserted bit-equality contract.
"""
from __future__ import annotations

import os
import subprocess

NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_build_failed: set = set()


def ensure_built(lib_name: str, src_name: str) -> "str | None":
    """Return the path to native/<lib_name>, (re)building it via make when it
    is missing or older than native/<src_name>.  Returns None (and remembers
    the failure) when the toolchain is unavailable or the build fails."""
    lib_path = os.path.join(NATIVE_DIR, lib_name)
    src = os.path.join(NATIVE_DIR, src_name)
    # Staleness reference = the newest build INPUT (source or Makefile — a
    # flag/define change in the Makefile must rebuild too, or a stale .so
    # silently shadows it).
    inputs = [
        p
        for p in (src, os.path.join(NATIVE_DIR, "Makefile"))
        if os.path.exists(p)
    ]
    if os.path.exists(lib_path) and (
        not inputs
        or os.path.getmtime(lib_path) >= max(os.path.getmtime(p) for p in inputs)
    ):
        return lib_path
    if lib_name in _build_failed:
        return None
    if not os.path.exists(src):
        _build_failed.add(lib_name)
        return None
    try:
        subprocess.run(
            ["make", "-C", NATIVE_DIR, lib_name],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        _build_failed.add(lib_name)
        return None
    return lib_path if os.path.exists(lib_path) else None

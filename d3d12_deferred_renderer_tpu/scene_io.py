"""Scene-state checkpoint/resume.

ABSENT from the reference (no state is ever saved; the only evolving state is the
animation clock and frame index — SURVEY.md §5).  Here the whole SceneState is a
pytree of arrays, so serialization is a flat .npz with the tree structure recorded —
save mid-flight, resume bit-exactly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .scene import SceneState


def _without_fv(state: SceneState) -> SceneState:
    """`state` with the host-precomputed face-vertex buffers dropped — the
    tree shape of a checkpoint saved by an older build (GeometryBuffers
    documents fv_* = None for exactly that case; ops/transform.py keeps the
    indexed fallback path alive for it)."""
    g = state.geometry
    return dataclasses.replace(
        state,
        geometry=dataclasses.replace(
            g, fv_positions=None, fv_normals=None, fv_uvs=None,
            fv_mesh_id=None, fv_pos_cols=None, fv_nrm_cols=None,
            fv_uv_cols=None,
        ),
    )


def save_scene(path: str, state: SceneState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_scene(path: str, like: SceneState) -> SceneState:
    """Load a checkpoint saved by save_scene.  `like` provides the tree
    structure (the treedef repr stored in the file is used as a consistency
    check).  A checkpoint saved WITHOUT the host-precomputed fv_* buffers (an
    older build) also loads against a fresh `like` — it resumes on the
    indexed fallback render path."""
    with np.load(path) as data:
        stored = bytes(data["__treedef__"]).decode()
        match = None
        for cand in (like, _without_fv(like)):
            _, treedef = jax.tree_util.tree_flatten(cand)
            if stored == repr(treedef):
                match = cand
                break
        if match is None:
            _, treedef = jax.tree_util.tree_flatten(like)
            raise ValueError(
                "checkpoint tree structure does not match the provided scene:\n"
                f"  stored: {stored[:200]}\n  expected: {repr(treedef)[:200]}"
            )
        like_leaves, treedef = jax.tree_util.tree_flatten(match)
        n = len([k for k in data.files if k.startswith("leaf_")])
        if n != len(like_leaves):
            raise ValueError(
                f"checkpoint tree structure mismatch: {n} leaves stored, "
                f"{len(like_leaves)} expected"
            )
        leaves = []
        for i, ref in enumerate(like_leaves):
            arr = data[f"leaf_{i}"]
            if tuple(arr.shape) != tuple(jnp.shape(ref)):
                raise ValueError(
                    "checkpoint tree structure/shape mismatch at leaf "
                    f"{i}: stored {tuple(arr.shape)}, expected {tuple(jnp.shape(ref))}"
                )
            ref_dtype = jnp.asarray(ref).dtype
            if arr.dtype != ref_dtype:
                raise ValueError(
                    f"checkpoint dtype mismatch at leaf {i}: stored "
                    f"{arr.dtype}, expected {ref_dtype} (was it saved under "
                    "a different x64 mode?)"
                )
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)

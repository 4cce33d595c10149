"""Scene-state checkpoint/resume.

ABSENT from the reference (no state is ever saved; the only evolving state is the
animation clock and frame index — SURVEY.md §5).  Here the whole SceneState is a
pytree of arrays, so serialization is a flat .npz with the tree structure recorded —
save mid-flight, resume bit-exactly.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .scene import SceneState


def save_scene(path: str, state: SceneState) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        repr(treedef).encode(), dtype=np.uint8
    )
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)


def load_scene(path: str, like: SceneState) -> SceneState:
    """Load a checkpoint saved by save_scene.  `like` provides the tree structure
    (the treedef repr stored in the file is used as a consistency check only)."""
    with np.load(path) as data:
        _, treedef = jax.tree_util.tree_flatten(like)
        stored = bytes(data["__treedef__"]).decode()
        if stored != repr(treedef):
            raise ValueError(
                "checkpoint tree structure does not match the provided scene:\n"
                f"  stored: {stored[:200]}\n  expected: {repr(treedef)[:200]}"
            )
        n = len([k for k in data.files if k.startswith("leaf_")])
        like_leaves = jax.tree_util.tree_leaves(like)
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
            leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)

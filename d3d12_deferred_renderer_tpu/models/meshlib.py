"""Mesh containers and the unified-buffer scene layout.

The reference concatenates every loaded mesh into ONE unified vertex buffer and ONE
unified index buffer with per-mesh offsets (source/main.cpp:836-913), then draws each
mesh via DrawIndexedInstanced(numIndices, 1, ibOffset, vbOffset, 0) (main.cpp:240).
That unified layout maps perfectly onto TPU: one big SoA vertex array means vertex
transform is a single large batched op on the MXU, with a per-triangle mesh id used to
gather the right model matrix.

Host-side data is numpy (cheap, done once at load); device upload happens when the
Scene pytree is built (scene.py).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class MeshData:
    """One loaded mesh: SoA vertex arrays + triangle indices (local, 0-based).

    Mirrors struct Mesh / struct Vertex (main.cpp:27-45): position, normal, uv per
    vertex.  The reference loads uv but never feeds it to the pipeline (input layout
    at main.cpp:709-712 omits it); we keep it, and actually use it for the
    normal-mapping/texture extensions.
    """

    positions: np.ndarray  # [V, 3] float32
    normals: np.ndarray    # [V, 3] float32
    uvs: np.ndarray        # [V, 2] float32
    indices: np.ndarray    # [I] uint32, I % 3 == 0
    name: str = ""

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0] // 3)

    @property
    def has_normals(self) -> bool:
        return bool(np.any(self.normals))

    def with_flat_normals(self) -> "MeshData":
        """Faceted re-mesh with per-face geometric normals.

        For OBJ files without `vn` data (the reference would shade those black:
        its loader leaves normals zero-initialized, main.cpp:1010-1025 — another
        latent case its assets never hit).  Each triangle gets its own 3 vertices
        carrying the face normal, oriented by the winding (counter-clockwise from
        outside -> outward normal)."""
        idx = self.indices.reshape(-1, 3).astype(np.int64)
        p0 = self.positions[idx[:, 0]]
        p1 = self.positions[idx[:, 1]]
        p2 = self.positions[idx[:, 2]]
        # Sign convention: triangles wound front-facing under the reference
        # rasterizer state (visually CCW from outside; see ops/transform.py) get
        # OUTWARD normals — cross(e2, e1) under this framework's LH conventions.
        n = np.cross(p2 - p0, p1 - p0)
        length = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.where(length == 0.0, 1.0, length)
        positions = np.stack([p0, p1, p2], axis=1).reshape(-1, 3)
        normals = np.repeat(n, 3, axis=0)
        uvs = self.uvs[idx.reshape(-1)]
        indices = np.arange(idx.size, dtype=np.uint32)
        return MeshData(
            positions=positions.astype(np.float32),
            normals=normals.astype(np.float32),
            uvs=uvs.astype(np.float32),
            indices=indices,
            name=self.name,
        )


@dataclasses.dataclass
class SceneGeometry:
    """All meshes packed into unified buffers (the C14 analog, main.cpp:836-913).

    ``indices`` are globalized (local index + vertex_offsets[mesh]), which is what
    DrawIndexedInstanced's BaseVertexLocation does implicitly in hardware.
    ``tri_mesh_id`` assigns every triangle its mesh, replacing the per-draw root-CBV
    offset (main.cpp:238) with a gather.
    """

    positions: np.ndarray       # [V, 3] float32 (unified)
    normals: np.ndarray         # [V, 3] float32
    uvs: np.ndarray             # [V, 2] float32
    indices: np.ndarray         # [I] int32, globalized
    tri_mesh_id: np.ndarray     # [I // 3] int32
    vertex_mesh_id: np.ndarray  # [V] int32
    vertex_offsets: np.ndarray  # [M] int32
    vertex_counts: np.ndarray   # [M] int32
    index_offsets: np.ndarray   # [M] int32
    index_counts: np.ndarray    # [M] int32
    names: tuple

    @property
    def num_meshes(self) -> int:
        return int(self.vertex_offsets.shape[0])

    @property
    def num_vertices(self) -> int:
        return int(self.positions.shape[0])

    @property
    def num_triangles(self) -> int:
        return int(self.indices.shape[0] // 3)


def build_scene_geometry(meshes: list[MeshData]) -> SceneGeometry:
    if not meshes:
        raise ValueError("scene needs at least one mesh")
    v_off, i_off = [], []
    vo = io = 0
    for m in meshes:
        v_off.append(vo)
        i_off.append(io)
        vo += m.num_vertices
        io += int(m.indices.shape[0])
    positions = np.concatenate([m.positions for m in meshes], axis=0)
    normals = np.concatenate([m.normals for m in meshes], axis=0)
    uvs = np.concatenate([m.uvs for m in meshes], axis=0)
    indices = np.concatenate(
        [m.indices.astype(np.int64) + off for m, off in zip(meshes, v_off)], axis=0
    ).astype(np.int32)
    tri_mesh_id = np.concatenate(
        [np.full(m.num_triangles, k, np.int32) for k, m in enumerate(meshes)]
    )
    vertex_mesh_id = np.concatenate(
        [np.full(m.num_vertices, k, np.int32) for k, m in enumerate(meshes)]
    )
    return SceneGeometry(
        positions=positions.astype(np.float32),
        normals=normals.astype(np.float32),
        uvs=uvs.astype(np.float32),
        indices=indices,
        tri_mesh_id=tri_mesh_id,
        vertex_mesh_id=vertex_mesh_id,
        vertex_offsets=np.asarray(v_off, np.int32),
        vertex_counts=np.asarray([m.num_vertices for m in meshes], np.int32),
        index_offsets=np.asarray(i_off, np.int32),
        index_counts=np.asarray([int(m.indices.shape[0]) for m in meshes], np.int32),
        names=tuple(m.name for m in meshes),
    )

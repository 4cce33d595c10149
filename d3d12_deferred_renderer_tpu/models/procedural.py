"""Procedurally generated meshes.

The reference ships only cube.obj and pyramid.obj but *asks* for three larger models
that are absent from the repo (main.cpp:824-826 loads bunny/buddha/roadBike, which do
not exist — the committed app cannot run as-is; SURVEY.md §2 dead-code notes).  These
generators provide the heavier stand-ins for benchmark scenes: spheres, toruses,
grids, and a "Sponza-class" multi-mesh arrangement for BASELINE config 3.

All generators emit faceted or smooth normals with ONE consistent winding that
shows EXTERIORS under the reference rasterizer state (back-face culling with
FrontCounterClockwise=TRUE, main.cpp:727-728).  NOTE this is deliberately the
OPPOSITE of the bundled cube.obj/pyramid.obj, whose CW winding renders
interiors — a preserved reference quirk (CLAUDE.md; ops/transform.py) that
must NOT be "fixed" in either place.
"""
from __future__ import annotations

import numpy as np

from .meshlib import MeshData


def cube(size: float = 1.0) -> MeshData:
    """Axis-aligned cube with faceted normals — same topology as assets/models/cube.obj
    after dedup (24 unique vertices, 36 indices) but wound to show EXTERIORS under
    the reference rasterizer state (the bundled OBJ assets are wound the other way;
    see ops/transform.py docstring on the preserved culling quirk)."""
    h = size * 0.5
    faces = [
        ((0, 0, 1), [(-h, -h, h), (h, -h, h), (h, h, h), (-h, h, h)]),
        ((0, 0, -1), [(h, -h, -h), (-h, -h, -h), (-h, h, -h), (h, h, -h)]),
        ((0, 1, 0), [(-h, h, h), (h, h, h), (h, h, -h), (-h, h, -h)]),
        ((0, -1, 0), [(-h, -h, -h), (h, -h, -h), (h, -h, h), (-h, -h, h)]),
        ((1, 0, 0), [(h, -h, h), (h, -h, -h), (h, h, -h), (h, h, h)]),
        ((-1, 0, 0), [(-h, -h, -h), (-h, -h, h), (-h, h, h), (-h, h, -h)]),
    ]
    pos, nrm, uv, idx = [], [], [], []
    for n, corners in faces:
        base = len(pos)
        for k, c in enumerate(corners):
            pos.append(c)
            nrm.append(n)
            uv.append(((k in (1, 2)) * 1.0, (k >= 2) * 1.0))
        idx.extend([base, base + 2, base + 1, base, base + 3, base + 2])
    return MeshData(
        positions=np.asarray(pos, np.float32),
        normals=np.asarray(nrm, np.float32),
        uvs=np.asarray(uv, np.float32),
        indices=np.asarray(idx, np.uint32),
        name="cube",
    )


def uv_sphere(radius: float = 0.5, rings: int = 16, segments: int = 32) -> MeshData:
    """Smooth-shaded UV sphere; 2*(rings-1)*segments triangles (the two pole
    caps emit one triangle per segment instead of two)."""
    ring_t = np.linspace(0.0, np.pi, rings + 1)
    seg_t = np.linspace(0.0, 2.0 * np.pi, segments + 1)
    tt, pp = np.meshgrid(ring_t, seg_t, indexing="ij")  # [rings+1, segments+1]
    x = np.sin(tt) * np.cos(pp)
    y = np.cos(tt)
    z = np.sin(tt) * np.sin(pp)
    n = np.stack([x, y, z], -1).reshape(-1, 3)
    pos = (radius * n).astype(np.float32)
    uv = np.stack([pp / (2 * np.pi), 1.0 - tt / np.pi], -1).reshape(-1, 2)

    def vid(r, s):
        return r * (segments + 1) + s

    idx = []
    for r in range(rings):
        for s in range(segments):
            a, b = vid(r, s), vid(r, s + 1)
            c, d = vid(r + 1, s), vid(r + 1, s + 1)
            # Outward-facing winding consistent with the cube above.
            if r != 0:
                idx.extend([a, c, b])
            if r != rings - 1:
                idx.extend([b, c, d])
    return MeshData(
        positions=pos,
        normals=n.astype(np.float32),
        uvs=uv.astype(np.float32),
        indices=np.asarray(idx, np.uint32),
        name="sphere",
    )


def torus(major: float = 0.6, minor: float = 0.25, rings: int = 24, sides: int = 16) -> MeshData:
    """Smooth torus; 2*rings*sides triangles.  The u/v seam rings are
    DUPLICATED (uv 1.0, same position/normal) like uv_sphere's seam column —
    modulo-shared seam vertices would interpolate uv backwards across the
    seam quads (a smeared band under any uv-driven material or bump)."""
    u = np.linspace(0, 2 * np.pi, rings + 1)
    v = np.linspace(0, 2 * np.pi, sides + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")  # [rings+1, sides+1]
    cx, cz = np.cos(uu), np.sin(uu)
    pos = np.stack(
        [(major + minor * np.cos(vv)) * cx, minor * np.sin(vv), (major + minor * np.cos(vv)) * cz],
        -1,
    ).reshape(-1, 3)
    nrm = np.stack([np.cos(vv) * cx, np.sin(vv), np.cos(vv) * cz], -1).reshape(-1, 3)
    uv = np.stack([uu / (2 * np.pi), vv / (2 * np.pi)], -1).reshape(-1, 2)

    def vid(r, s):
        return r * (sides + 1) + s

    idx = []
    for r in range(rings):
        for s in range(sides):
            a, b = vid(r, s), vid(r + 1, s)
            c, d = vid(r, s + 1), vid(r + 1, s + 1)
            idx.extend([a, b, c, c, b, d])
    return MeshData(
        positions=pos.astype(np.float32),
        normals=nrm.astype(np.float32),
        uvs=uv.astype(np.float32),
        indices=np.asarray(idx, np.uint32),
        name="torus",
    )


def ground_plane(size: float = 20.0, y: float = -1.0) -> MeshData:
    h = size * 0.5
    pos = np.asarray([(-h, y, -h), (h, y, -h), (h, y, h), (-h, y, h)], np.float32)
    nrm = np.tile(np.asarray([[0, 1, 0]], np.float32), (4, 1))
    uv = np.asarray([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
    # Upward-facing: visible (front-facing) from above under the reference
    # rasterizer state, verified by the shadow tests.
    idx = np.asarray([0, 1, 2, 0, 2, 3], np.uint32)
    return MeshData(pos, nrm, uv, idx, name="ground")


def colonnade_meshes(
    n_columns: int = 12, n_orbs: int = 10, rings: int = 20, segments: int = 40
) -> list[MeshData]:
    """A second benchmark layout with a deliberately different footprint
    profile from benchmark_meshes: a larger ground slab, a ring of TALL
    stretched columns (wide screen-space quads at grazing angles — stresses
    the medium/large binning tiers), and a line of spheres/toruses marching
    toward the far plane (small far-away footprints — stresses the small-tier
    budget and light-list depth).  Used to validate that calibrate.autotune
    derives overflow-free budgets on content the flagship numbers were never
    hand-tuned for."""
    meshes: list[MeshData] = [ground_plane(size=28.0)]
    for k in range(n_columns):
        c = cube(1.0)
        # Stretch the unit cube into a 0.6 x 3.2 x 0.6 column in-place.
        c.positions[:, 0] *= 0.6
        c.positions[:, 1] *= 3.2
        c.positions[:, 2] *= 0.6
        c.positions[:, 1] += 0.6  # base on the ground plane (y = -1)
        ang = 2.0 * np.pi * k / n_columns
        r = 6.5
        c.positions[:, 0] += r * np.cos(ang)
        c.positions[:, 2] += r * np.sin(ang)
        meshes.append(c)
    for k in range(n_orbs):
        m = uv_sphere(0.5, rings, segments) if k % 2 == 0 else torus(
            0.45, 0.18, rings, max(8, segments // 3)
        )
        m.positions[:, 2] += -4.0 + 2.2 * k  # march toward the far plane
        m.positions[:, 0] += (-1.0) ** k * 1.5
        meshes.append(m)
    return meshes


def benchmark_meshes(n: int = 24, rings: int = 24, segments: int = 48) -> list[MeshData]:
    """A 'Sponza-class' multi-mesh set for BASELINE config 3: a ground plane plus a
    grid of spheres/toruses/cubes (tens of thousands of triangles)."""
    meshes: list[MeshData] = [ground_plane()]
    kinds = [
        lambda: uv_sphere(0.45, rings, segments),
        lambda: torus(0.42, 0.16, rings, max(8, segments // 3)),
        lambda: cube(0.7),
    ]
    for k in range(n):
        meshes.append(kinds[k % len(kinds)]())
    return meshes

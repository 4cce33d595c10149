"""Vertex transform and triangle setup — the fixed-function front of the geometry pass.

What D3D12 does in the input assembler + vertex shader + primitive setup
(geometry.hlsl:27-40; rasterizer state at main.cpp:725-766) becomes two dense ops:

1. ``vertex_transform``: one batched matmul over the unified vertex buffer.  The
   reference re-uploads per-mesh MVP constant buffers and issues one draw per mesh
   (main.cpp:210-241); here every mesh's matrix is computed at once ([M,4,4]) and
   gathered per vertex, so the whole scene transforms in a single MXU-friendly op.

2. ``triangle_setup``: perspective divide, viewport transform (D3D convention:
   y flipped, pixel centers at +0.5), back-face cull (FrontCounterClockwise=TRUE,
   CULL_BACK — main.cpp:727-728), winding canonicalization, near-plane rejection, and
   per-triangle packing of everything the rasterizer needs (screen verts, NDC z,
   1/w, attributes premultiplied by 1/w for perspective-correct interpolation).

Facing convention: D3D determines facing from the signed area in render-target space
(y down).  With FrontCounterClockwise=TRUE, front-facing ⟺ signed area < 0 under the
standard 2D cross product in y-down coordinates.  NOTE a preserved reference quirk:
the bundled cube/pyramid OBJs are wound clockwise when viewed from outside, so under
the reference's rasterizer state their camera-facing sides are CULLED and the far
(interior) faces are what you see.  We reproduce that faithfully; procedural
benchmark meshes are wound to show exteriors.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import xmath
from ..config import RendererConfig
from ..scene import SceneState

# Packed triangle-record layout (float32 lanes) consumed by the Pallas rasterizer.
# Kept in one flat [T, TRI_STRIDE] array so the kernel can DMA whole records.
TRI_X0, TRI_Y0, TRI_X1, TRI_Y1, TRI_X2, TRI_Y2 = 0, 1, 2, 3, 4, 5
TRI_Z0, TRI_Z1, TRI_Z2 = 6, 7, 8
TRI_RW0, TRI_RW1, TRI_RW2 = 9, 10, 11
TRI_N0 = 12  # 12-14: normal0 * rw0
TRI_N1 = 15  # 15-17
TRI_N2 = 18  # 18-20
TRI_UV0 = 21  # 21-22: uv0 * rw0
TRI_UV1 = 23  # 23-24
TRI_UV2 = 25  # 25-26
TRI_MESH_ID = 27
TRI_VALID = 28
TRI_AREA = 29  # canonical (positive) doubled area
TRI_STRIDE = 32  # padded for aligned VMEM rows


class TriSetup(NamedTuple):
    """Unpacked triangle setup; `packed` is the flat [T, TRI_STRIDE] record array."""

    packed: jnp.ndarray   # [T, TRI_STRIDE] float32
    aabb: jnp.ndarray     # [T, 4] float32: minx, miny, maxx, maxy (pixel coords)
    valid: jnp.ndarray    # [T] bool

    @property
    def num_triangles(self) -> int:
        return int(self.packed.shape[0])


def camera_matrices(state: SceneState, cfg: RendererConfig):
    """View and projection matrices from the scene camera (main.cpp:214-224)."""
    view = xmath.look_at_lh(state.camera.eye, state.camera.at, state.camera.up)
    proj = xmath.perspective_fov_lh(cfg.fov_y, cfg.aspect, cfg.z_near, cfg.z_far)
    return view, proj


def vertex_transform(state: SceneState, cfg: RendererConfig):
    """Transform the unified vertex buffer to clip space + world-space normals.

    Returns (clip [V,4], world_normal [V,3], view_proj [4,4]).
    Matches geometry.hlsl:32-37: position through model/view/projection, normal
    through the model matrix only (deliberately NOT the inverse-transpose).
    """
    geo = state.geometry
    model = xmath.model_matrix(state.position, state.orientation, state.scale)  # [M,4,4]
    view, proj = camera_matrices(state, cfg)
    view_proj = view @ proj
    mvp = model @ view_proj  # [M,4,4]

    vm = geo.vertex_mesh_id
    clip = xmath.transform_points(geo.logical_positions(), mvp[vm])     # [V,4]
    world_n = xmath.transform_vectors(geo.logical_normals(), model[vm])  # [V,3]
    return clip, world_n, view_proj


def face_vertex_transform(state: SceneState, cfg: RendererConfig):
    """Gather-free vertex transform over the host-pre-expanded face-vertex
    buffers (GeometryBuffers.fv_*): the input-assembler index fetch happened at
    scene build, so the per-frame work is two dense batched matmuls plus one
    small [M,4,4]->[I,4,4] matrix gather.

    Returns (clip [I,4], world_normal [I,3], view_proj [4,4]) with I = 3*T rows
    in triangle submission order — feed triangle_setup(pregathered=True).

    The per-vertex matrix selection is a one-hot contraction, NOT a gather:
    one [I,4] x [4, M*4] MXU matmul against every mesh's matrix at once, then
    a masked reduction over the (small) mesh axis — row gathers of [M,4,4]
    cost ~1 ms at 72k face-vertices on TPU; this is pure MXU/VPU."""
    geo = state.geometry
    model = xmath.model_matrix(state.position, state.orientation, state.scale)
    view, proj = camera_matrices(state, cfg)
    view_proj = view @ proj
    mvp = model @ view_proj

    fm = geo.fv_mesh_id
    I = fm.shape[0]
    M = mvp.shape[0]
    onehot = (fm[:, None] == jnp.arange(M, dtype=fm.dtype)).astype(jnp.float32)
    hp = jax.lax.Precision.HIGHEST

    pos_h = jnp.concatenate(
        [geo.fv_positions, jnp.ones((I, 1), jnp.float32)], axis=-1
    )
    clip_all = jnp.matmul(
        pos_h, mvp.transpose(1, 0, 2).reshape(4, M * 4), precision=hp
    )  # [I, M*4]: row n transformed by EVERY mesh's mvp
    clip = jnp.sum(clip_all.reshape(I, M, 4) * onehot[:, :, None], axis=1)

    nrm_all = jnp.matmul(
        geo.fv_normals, model[:, :3, :3].transpose(1, 0, 2).reshape(3, M * 3),
        precision=hp,
    )
    world_n = jnp.sum(nrm_all.reshape(I, M, 3) * onehot[:, :, None], axis=1)
    return clip, world_n, view_proj


def _clip_near_plane(c, n, uv):
    """Clip triangles against the near plane (clip-space z = 0, D3D convention).

    Static-shape formulation for XLA: every input triangle emits EXACTLY TWO output
    slots.  A fully-inside triangle emits (itself, degenerate); a triangle with one
    vertex inside emits (clipped tri, degenerate); two vertices inside emit the two
    triangles of the clipped quad; fully-outside emits two degenerates.  Degenerate
    slots have zero area and are rejected downstream.  Cyclic vertex rotation keeps
    winding intact; attributes lerp in clip space (exact, pre-divide).

    c: [T, 3, 4] clip positions; n: [T, 3, 3]; uv: [T, 3, 2].
    Returns (c2, n2, uv2, duplicate) where duplicate(a) maps any per-input-triangle
    array to the 2T output slots (slot pairs share their source's value).
    """
    T = c.shape[0]
    z = c[..., 2]
    inside = z >= 0.0  # [T, 3]
    n_in = inside.sum(axis=-1)  # [T]

    # Rotate vertex order to a canonical arrangement (preserves winding):
    #   n_in == 1 -> the inside vertex at slot 0
    #   n_in == 2 -> the outside vertex at slot 2
    first_in = jnp.argmax(inside, axis=-1)
    first_out = jnp.argmax(~inside, axis=-1)
    r = jnp.where(n_in == 1, first_in, jnp.where(n_in == 2, (first_out + 1) % 3, 0))

    def rot(a):
        # r is one of 3 cyclic rotations: a where-chain over the two static
        # rolls beats take_along_axis (a per-element gather on TPU).
        a1 = jnp.concatenate([a[:, 1:], a[:, :1]], axis=1)
        a2 = jnp.concatenate([a[:, 2:], a[:, :2]], axis=1)
        rr = r.reshape(T, *([1] * (a.ndim - 1)))
        return jnp.where(rr == 0, a, jnp.where(rr == 1, a1, a2))

    c = rot(c)
    n = rot(n)
    uv = rot(uv)
    zA, zB, zC = c[:, 0, 2], c[:, 1, 2], c[:, 2, 2]

    def lerp_t(za, zb):
        d = za - zb
        return za / jnp.where(d == 0.0, 1.0, d)

    def lerp(a, b, t):
        return a + (b - a) * t[:, None]

    tAB = lerp_t(zA, zB)
    tAC = lerp_t(zA, zC)
    tBC = lerp_t(zB, zC)

    def mk(v0, v1, v2):
        return jnp.stack([v0, v1, v2], axis=1)

    outs = []
    for attr in (c, n, uv):
        A, B, C = attr[:, 0], attr[:, 1], attr[:, 2]
        AB = lerp(A, B, tAB)
        AC = lerp(A, C, tAC)
        BC = lerp(B, C, tBC)
        case0 = mk(A, A, A)            # n_in == 0: degenerate
        case1a = mk(A, AB, AC)         # n_in == 1 (A in): one clipped tri
        case2a = mk(A, B, BC)          # n_in == 2 (C out): quad tri 1
        case2b = mk(A, BC, AC)         #                    quad tri 2
        case3a = mk(A, B, C)           # n_in == 3: unchanged
        sel1 = (n_in == 1)[:, None, None]
        sel2 = (n_in == 2)[:, None, None]
        sel3 = (n_in == 3)[:, None, None]
        slot0 = jnp.where(sel3, case3a, jnp.where(sel2, case2a, jnp.where(sel1, case1a, case0)))
        slot1 = jnp.where(sel2, case2b, case0)
        outs.append(jnp.stack([slot0, slot1], axis=1).reshape(2 * T, 3, -1))
    c2, n2, uv2 = outs

    def duplicate(a):
        # Interleave-duplicate WITHOUT an index-array gather: a size-T iota
        # constant here would be baked into the HLO and make compile time scale
        # with the triangle count.
        return jnp.stack([a, a], axis=1).reshape((2 * T,) + a.shape[1:])

    return c2, n2, uv2, duplicate


def triangle_setup(
    clip: jnp.ndarray,
    world_normal: jnp.ndarray,
    uvs: jnp.ndarray,
    indices: jnp.ndarray,
    tri_mesh_id: jnp.ndarray,
    cfg: RendererConfig,
    cull: str = "back",
    front_ccw: bool = True,
    near_clip: bool = True,
    pregathered: bool = False,
) -> TriSetup:
    """Primitive setup: near-plane clip, cull, canonicalize winding, pack records.

    With near_clip=True (default) the output has 2x the input triangle count
    (static-shape clipping, see _clip_near_plane).  With pregathered=True the
    clip/normal/uv inputs are already face-vertex expanded ([3T, ...] rows in
    submission order — see face_vertex_transform) and `indices` is ignored."""
    W, H = cfg.width, cfg.height

    if pregathered:
        c = clip.reshape(-1, 3, 4)
        n = world_normal.reshape(-1, 3, 3)
        uv = uvs.reshape(-1, 3, 2)
    else:
        tri_idx = indices.reshape(-1, 3)  # [T, 3]
        c = clip[tri_idx]          # [T, 3, 4]
        n = world_normal[tri_idx]  # [T, 3, 3]
        uv = uvs[tri_idx]          # [T, 3, 2]

    if near_clip:
        c, n, uv, duplicate = _clip_near_plane(c, n, uv)
        tri_mesh_id = duplicate(tri_mesh_id)

    w = c[..., 3]
    # After near clipping every surviving vertex has clip z >= 0, which for the LH
    # projection implies w >= z_near > 0; the guard below only rejects numerical
    # stragglers and degenerate fills.
    w_ok = jnp.all(w > 1e-6, axis=-1)

    rw = 1.0 / jnp.where(w == 0.0, 1.0, w)  # [T, 3]
    ndc = c[..., :3] * rw[..., None]        # [T, 3, 3]

    # D3D viewport transform (viewport at main.cpp:90): y flips, z stays in [0, 1].
    sx = (ndc[..., 0] + 1.0) * (W * 0.5)
    sy = (1.0 - ndc[..., 1]) * (H * 0.5)
    sz = ndc[..., 2]

    # Signed doubled area in y-down render-target space.
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])

    front = (area2 < 0.0) if front_ccw else (area2 > 0.0)
    if cull == "back":
        keep_facing = front
    elif cull == "front":
        keep_facing = ~front
    elif cull == "none":
        keep_facing = jnp.ones_like(front)
    else:
        raise ValueError(f"unknown cull mode {cull!r}")

    valid = w_ok & keep_facing & (area2 != 0.0)

    # Trivial frustum reject: AABB fully outside the screen or beyond depth range.
    minx = jnp.min(sx, axis=-1)
    maxx = jnp.max(sx, axis=-1)
    miny = jnp.min(sy, axis=-1)
    maxy = jnp.max(sy, axis=-1)
    on_screen = (maxx >= 0.0) & (minx < W) & (maxy >= 0.0) & (miny < H)
    z_ok = (jnp.max(sz, axis=-1) >= 0.0) & (jnp.min(sz, axis=-1) <= 1.0)
    valid = valid & on_screen & z_ok

    # Canonicalize winding to positive area (swap v1 <-> v2 when negative) so the
    # rasterizer's inside test is uniformly e >= 0.
    swap = area2 < 0.0

    def pick(a):  # a: [T, 3, ...] -> canonical vertex order
        s = swap.reshape(swap.shape + (1,) * (a.ndim - 2))
        a1 = jnp.where(s, a[:, 2], a[:, 1])
        a2 = jnp.where(s, a[:, 1], a[:, 2])
        return a[:, 0], a1, a2

    sxy = jnp.stack([sx, sy], axis=-1)  # [T, 3, 2]
    p0, p1, p2 = pick(sxy)
    z0, z1, z2 = pick(sz[..., None])
    rw0, rw1, rw2 = pick(rw[..., None])
    n0, n1, n2 = pick(n)
    t0, t1, t2 = pick(uv)

    area_c = jnp.abs(area2)

    # Assemble the record in one concatenate (a single fused pass; a chain of 20
    # scatter-updates would re-materialize the [T, 32] array each time).  Column
    # order MUST follow the TRI_* layout above.
    zeros_pad = jnp.zeros((c.shape[0], TRI_STRIDE - TRI_AREA - 1), jnp.float32)
    packed = jnp.concatenate(
        [
            p0, p1, p2,                                   # 0-5: x0 y0 x1 y1 x2 y2
            z0, z1, z2,                                   # 6-8
            rw0, rw1, rw2,                                # 9-11
            n0 * rw0, n1 * rw1, n2 * rw2,                 # 12-20
            t0 * rw0, t1 * rw1, t2 * rw2,                 # 21-26
            tri_mesh_id.astype(jnp.float32)[:, None],     # 27
            valid.astype(jnp.float32)[:, None],           # 28
            area_c[:, None],                              # 29
            zeros_pad,                                    # 30-31
        ],
        axis=-1,
    )

    aabb = jnp.stack(
        [
            jnp.clip(minx, 0.0, W),
            jnp.clip(miny, 0.0, H),
            jnp.clip(maxx, 0.0, W),
            jnp.clip(maxy, 0.0, H),
        ],
        axis=-1,
    )
    return TriSetup(packed=packed, aabb=aabb, valid=valid)


def setup_frame_triangles(state: SceneState, cfg: RendererConfig, **kw) -> tuple:
    """Full front-end: vertex transform + triangle setup.  Returns (TriSetup, view_proj).

    Uses the gather-free face-vertex path when the geometry carries the
    host-pre-expanded fv_* buffers (always, for scenes built this round);
    falls back to the indexed path for geometry resumed from old checkpoints."""
    geo = state.geometry
    if geo.fv_positions is not None:
        clip, world_n, view_proj = face_vertex_transform(state, cfg)
        tris = triangle_setup(
            clip, world_n, geo.fv_uvs, None, geo.tri_mesh_id, cfg,
            pregathered=True, **kw,
        )
    else:
        clip, world_n, view_proj = vertex_transform(state, cfg)
        tris = triangle_setup(
            clip, world_n, geo.logical_uvs(), geo.indices, geo.tri_mesh_id,
            cfg, **kw,
        )
    return tris, view_proj

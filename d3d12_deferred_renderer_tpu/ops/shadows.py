"""Directional-light shadow mapping (BASELINE config 4).

Absent from the reference (single unshadowed directional light, main.cpp:245-247);
added as a capability extension.  The shadow map is a depth-only render from the
light's orthographic view, produced by the SAME rasterizer as the main geometry pass
— one more pallas_call/XLA fragment inside the single frame program.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import xmath
from ..config import RendererConfig
from ..scene import SceneState
from .raster_ref import rasterize_packed
from .transform import triangle_setup


def orthographic_lh(width, height, z_near, z_far, dtype=jnp.float32):
    """XMMatrixOrthographicLH semantics (row-vector convention)."""
    zr = 1.0 / (z_far - z_near)
    m = jnp.zeros((4, 4), dtype)
    m = m.at[0, 0].set(2.0 / width)
    m = m.at[1, 1].set(2.0 / height)
    m = m.at[2, 2].set(zr)
    m = m.at[3, 2].set(-z_near * zr)
    m = m.at[3, 3].set(1.0)
    return m


def light_view_proj(
    light_direction: jnp.ndarray,
    center=(0.0, 0.0, 0.0),
    extent: float = 24.0,
    distance: float = 30.0,
):
    """Ortho view-projection covering a world-space box around `center` as seen
    along the light direction."""
    d = light_direction / jnp.linalg.norm(light_direction)
    center = jnp.asarray(center, jnp.float32)
    eye = center - d * distance
    up = jnp.where(
        jnp.abs(d[1]) > 0.99,
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
    )
    view = xmath.look_at_lh(eye, center, up)
    proj = orthographic_lh(extent, extent, 0.1, distance * 2.0)
    return view @ proj


def render_shadow_map(state: SceneState, cfg: RendererConfig):
    """Depth-only pass from the light's view.  Returns (depth [S,S], light_vp)."""
    S = cfg.shadow_map_size
    lvp = light_view_proj(state.lights.direction)

    geo = state.geometry
    model = xmath.model_matrix(state.position, state.orientation, state.scale)
    vm = geo.vertex_mesh_id
    clip = xmath.transform_points(geo.logical_positions(), (model @ lvp)[vm])

    shadow_cfg = dataclasses.replace(cfg, width=S, height=S)
    # Cull nothing for shadow casting (both faces occlude).
    tris = triangle_setup(
        clip,
        geo.logical_normals(),  # attributes unused in a depth-only pass
        geo.logical_uvs(),
        geo.indices,
        geo.tri_mesh_id,
        shadow_cfg,
        cull="none",
    )
    frags = rasterize_packed(tris.packed, S, S)
    return frags.depth, lvp


def shadow_visibility(
    depth: jnp.ndarray,
    view_proj: jnp.ndarray,
    shadow_depth: jnp.ndarray,
    light_vp: jnp.ndarray,
    cfg: RendererConfig,
    bias: float = 2e-3,
) -> jnp.ndarray:
    """Per-pixel visibility of the directional light with 2x2 PCF. [H, W] in [0,1]."""
    from .lighting import reconstruct_world_positions

    S = shadow_depth.shape[0]
    world = reconstruct_world_positions(depth, view_proj, cfg)
    h = jnp.concatenate([world, jnp.ones_like(world[..., :1])], -1)
    lc = jnp.einsum("hwi,ij->hwj", h, light_vp)
    ndc = lc[..., :3] / jnp.maximum(lc[..., 3:4], 1e-8)

    # Same viewport convention as the main pass: y flipped, pixel centers +0.5.
    u = (ndc[..., 0] + 1.0) * (S * 0.5) - 0.5
    v = (1.0 - ndc[..., 1]) * (S * 0.5) - 0.5
    z = ndc[..., 2]

    def tap(du, dv):
        iu = jnp.clip(jnp.floor(u + du).astype(jnp.int32), 0, S - 1)
        iv = jnp.clip(jnp.floor(v + dv).astype(jnp.int32), 0, S - 1)
        stored = shadow_depth[iv, iu]
        return (z <= stored + bias).astype(jnp.float32)

    vis = (tap(0, 0) + tap(1, 0) + tap(0, 1) + tap(1, 1)) * 0.25
    inside = (
        (ndc[..., 0] >= -1.0) & (ndc[..., 0] <= 1.0)
        & (ndc[..., 1] >= -1.0) & (ndc[..., 1] <= 1.0)
        & (z >= 0.0) & (z <= 1.0)
    )
    return jnp.where(inside, vis, 1.0)

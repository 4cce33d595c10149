"""Procedural normal mapping (BASELINE config 4).

The reference loads no textures (stb_image is dead code, main.cpp:24-25), so there
are no tangent-space normal maps to sample.  We implement normal mapping the
deferred-renderer way without stored tangents: screen-space derivative bump mapping
(Mikkelsen, "Bump Mapping Unparametrized Surfaces on the GPU").  Tangent/bitangent
are reconstructed per pixel from screen-space derivatives of the world position and
the interpolated uv, and the height field is an analytic procedural pattern of uv —
so the whole thing stays inside the single jitted frame program.

Operates on the full-screen fragment planes between rasterization and G-buffer
encode (the geometry-phase slot where a texture-based pipeline would sample its
normal map).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import RendererConfig
from .raster_ref import FragmentPlanes


def _ddx(a):
    """Forward difference along x with edge clamp; [H, W, C]."""
    d = a[:, 1:] - a[:, :-1]
    return jnp.concatenate([d, d[:, -1:]], axis=1)


def _ddy(a):
    d = a[1:] - a[:-1]
    return jnp.concatenate([d, d[-1:]], axis=0)


def procedural_height_gradient(uv: jnp.ndarray, freq: float = 24.0):
    """Analytic dh/du, dh/dv of h(u,v) = sin(2*pi*f*u) * sin(2*pi*f*v) / (2*pi*f)."""
    w = 2.0 * jnp.pi * freq
    u, v = uv[..., 0], uv[..., 1]
    dh_du = jnp.cos(w * u) * jnp.sin(w * v)
    dh_dv = jnp.sin(w * u) * jnp.cos(w * v)
    return dh_du, dh_dv


def apply_normal_mapping(
    frags: FragmentPlanes,
    world_pos: jnp.ndarray,
    cfg: RendererConfig,
    strength: float = 0.35,
    freq: float = 24.0,
) -> FragmentPlanes:
    """Perturb fragment normals with the procedural height field.

    world_pos: [H, W, 3] reconstructed positions (reused from the lighting path).
    Derivatives across different meshes (silhouettes) are meaningless; those pixels
    keep their geometric normal.
    """
    uv = frags.uv
    dp_dx, dp_dy = _ddx(world_pos), _ddy(world_pos)
    duv_dx, duv_dy = _ddx(uv), _ddy(uv)

    # Solve for the uv-aligned surface tangents T (d world / d u) and B:
    #   [dp_dx]   [du_dx dv_dx] [T]
    #   [dp_dy] = [du_dy dv_dy] [B]
    det = duv_dx[..., 0] * duv_dy[..., 1] - duv_dx[..., 1] * duv_dy[..., 0]
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    inv = 1.0 / safe_det
    T = (dp_dx * duv_dy[..., 1:2] - dp_dy * duv_dx[..., 1:2]) * inv[..., None]
    B = (dp_dy * duv_dx[..., 0:1] - dp_dx * duv_dy[..., 0:1]) * inv[..., None]

    dh_du, dh_dv = procedural_height_gradient(uv, freq)
    n = frags.normal
    n_norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n_unit = n / jnp.where(n_norm == 0.0, 1.0, n_norm)

    # Project tangents off the normal (keep perturbation in the tangent plane),
    # normalize to bound the bump slope independent of uv parameterization scale.
    def tangentize(t):
        t = t - jnp.sum(t * n_unit, -1, keepdims=True) * n_unit
        norm = jnp.linalg.norm(t, axis=-1, keepdims=True)
        return t / jnp.where(norm < 1e-12, 1.0, norm)

    Tt, Bt = tangentize(T), tangentize(B)
    perturbed = n_unit - strength * (dh_du[..., None] * Tt + dh_dv[..., None] * Bt)
    pn = jnp.linalg.norm(perturbed, axis=-1, keepdims=True)
    perturbed = perturbed / jnp.where(pn == 0.0, 1.0, pn)

    # Validity: same mesh under all derivative taps, nondegenerate uv mapping.
    mid = frags.mesh_id
    same_x = jnp.concatenate([mid[:, 1:] == mid[:, :-1], jnp.ones_like(mid[:, :1], bool)], 1)
    same_y = jnp.concatenate([mid[1:] == mid[:-1], jnp.ones_like(mid[:1], bool)], 0)
    ok = (mid >= 0) & same_x & same_y & (jnp.abs(det) >= 1e-12)

    new_normal = jnp.where(ok[..., None], perturbed, frags.normal)
    return frags._replace(normal=new_normal)

"""Texture sampling: the lighting pass's static linear-clamp sampler (C10 analog).

The reference binds a MIN_MAG_MIP_LINEAR / CLAMP static sampler (main.cpp:632-638)
and samples the G-buffer with uv = pixel center / resolution (lighting.hlsl:34-35)
— which lands exactly on texel centers, so bilinear == nearest there and the
lighting path reads the G-buffer directly.  This module provides the general
sampler for every case where the uv grid does NOT align (shadow-map lookups,
post-process chains, future texture support), with D3D texel addressing:
texel i covers [i, i+1), centers at i+0.5, CLAMP addressing.
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_nearest(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """tex [Ht, Wt, C] or [Ht, Wt]; uv [..., 2] in [0,1] -> [..., C]."""
    Ht, Wt = tex.shape[0], tex.shape[1]
    x = jnp.clip(jnp.floor(uv[..., 0] * Wt).astype(jnp.int32), 0, Wt - 1)
    y = jnp.clip(jnp.floor(uv[..., 1] * Ht).astype(jnp.int32), 0, Ht - 1)
    return tex[y, x]


def sample_bilinear(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear filtering with CLAMP addressing (D3D11 functional-spec weights).

    tex [Ht, Wt, C] or [Ht, Wt]; uv [..., 2] in [0,1] -> [..., C] / [...]."""
    Ht, Wt = tex.shape[0], tex.shape[1]
    fx = uv[..., 0] * Wt - 0.5
    fy = uv[..., 1] * Ht - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def at(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, Wt - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, Ht - 1)
        return tex[yi, xi]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    if tex.ndim == 3:
        tx = tx[..., None]
        ty = ty[..., None]
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty


def sample_bilinear_cmp(
    tex: jnp.ndarray, uv: jnp.ndarray, ref: jnp.ndarray, bias: float = 0.0
) -> jnp.ndarray:
    """D3D comparison sampler (SampleCmp with LESS_EQUAL + linear filtering):
    compare `ref <= texel + bias` at each of the 2x2 footprint texels FIRST,
    then bilinearly weight the binary results — percentage-closer filtering
    with the same texel addressing/weights as sample_bilinear.

    tex [Ht, Wt]; uv [..., 2] in [0,1]; ref [...] -> visibility [...] in [0,1].
    """
    Ht, Wt = tex.shape[0], tex.shape[1]
    tex_flat = tex.reshape(-1)  # 1D takes lower better than 2D fancy indexing
    fx = uv[..., 0] * Wt - 0.5
    fy = uv[..., 1] * Ht - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0

    def tap(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, Wt - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, Ht - 1)
        return (ref <= tex_flat[yi * Wt + xi] + bias).astype(jnp.float32)

    c00 = tap(x0, y0)
    c10 = tap(x0 + 1, y0)
    c01 = tap(x0, y0 + 1)
    c11 = tap(x0 + 1, y0 + 1)
    top = c00 + (c10 - c00) * tx
    bot = c01 + (c11 - c01) * tx
    return top + (bot - top) * ty

"""Standalone Pallas deferred-lighting kernel over G-buffer planes.

The staged pipeline's pure-XLA tiled shading (lighting.shade_pbr_tiled) scans
every per-tile light SLOT — cost O(cap x pixels) regardless of live counts —
~20x slower on chip than the Mosaic paths.  This kernel closes that gap for
any STAGED config (the fused mono-kernel separately covers the full feature
stack, including config 4 — see fused.render_fused): it consumes the ENCODED
G-buffer planes (+ the optional shadow-visibility plane) from HBM, decodes
them exactly like lighting.hlsl:34-40, and runs the SAME shading body as the
fused kernel (fused._shade_row — world reconstruction, directional GGX x
visibility, chunked-sublane point-light loop), emitting linear HDR so the XLA
post chain (bloom -> tonemap -> gamma) runs unchanged.

Staged configs on TPU therefore share one shading implementation with the
fused path; the pure-XLA shade_pbr_tiled remains the CPU path and the
semantics oracle the tests compare against.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RendererConfig
from ..scene import Lights
from .fused import (
    U_AMBIENT,
    U_EYE,
    U_H,
    U_INV_VP,
    U_LCOLOR,
    U_LDIR,
    U_SIZE,
    U_W,
    U_Y0,
    _shade_row,
    build_light_table,
    pad_light_ids_to_chunk,
)
from .gbuffer import GBuffer
from .lighting import cull_lights_to_tiles

# Input plane indices (leading dim of the stacked G-buffer array).
_P_AR, _P_AG, _P_AB, _P_MET = 0, 1, 2, 3
_P_NX, _P_NY, _P_NZ, _P_RGH = 4, 5, 6, 7
_P_DEPTH, _P_VIS = 8, 9


def _shade_kernel(
    light_counts, uniforms, planes_ref, lights_ref, lids_ref, out_ref,
    *, tile_h, tile_w, ntx, gamma, group, has_vis,
):
    ty = pl.program_id(0)
    gx = pl.program_id(1)

    # Decode (lighting.hlsl:34-40): albedo sRGB -> linear via pow gamma,
    # normal *2-1 then renormalize — identical to gbuffer.decode_gbuffer.
    ar = planes_ref[_P_AR]
    ag = planes_ref[_P_AG]
    ab = planes_ref[_P_AB]
    alb = jnp.stack([ar, ag, ab])
    alb = jnp.power(jnp.maximum(alb, 0.0), gamma)
    metal = planes_ref[_P_MET]
    dx_ = planes_ref[_P_NX] * 2.0 - 1.0
    dy_ = planes_ref[_P_NY] * 2.0 - 1.0
    dz_ = planes_ref[_P_NZ] * 2.0 - 1.0
    dlen = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    inv_dlen = 1.0 / jnp.where(dlen == 0.0, 1.0, dlen)
    n = jnp.stack([dx_ * inv_dlen, dy_ * inv_dlen, dz_ * inv_dlen])
    rough = planes_ref[_P_RGH]
    depth = planes_ref[_P_DEPTH]
    vis = planes_ref[_P_VIS] if has_vis else None

    hdr = _shade_row(
        uniforms, lights_ref, lids_ref, light_counts, ty, gx, group,
        tile_h, tile_w, ntx, depth, n, alb, metal, rough, vis=vis,
    )
    out_ref[0] = hdr[0]
    out_ref[1] = hdr[1]
    out_ref[2] = hdr[2]


def shade_pbr_tiled_pallas(
    gb: GBuffer,
    lights: Lights,
    cfg: RendererConfig,
    view_proj: jnp.ndarray,
    eye: jnp.ndarray,
    shadow_visibility: jnp.ndarray | None = None,
    interpret: bool = False,
    return_overflow: bool = False,
    y_offset=0,
    full_height: int | None = None,
):
    """Tiled-deferred PBR shading -> linear HDR [H, W, 3] (same contract as
    lighting.shade_pbr_tiled; per-tile light lists are exact and depth-aware,
    capped at cfg.max_live_lights_per_tile with loud overflow).

    `y_offset`/`full_height` shade a horizontal band of a taller framebuffer
    (the screen-sharded multi-chip path): pixel rows map to full-frame NDC via
    the U_Y0 uniform, and light culling sees the same band offset — shading is
    per-pixel exact for any band split (culling keeps every light whose sphere
    intersects the tile AABB, and the falloff window is zero at the radius)."""
    H, W = gb.depth.shape
    FH = full_height or H
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW
    NT = nty * ntx

    # Stack planar inputs; pad to whole tiles with background (depth 1.0).
    planes = [
        gb.gb0[..., 0], gb.gb0[..., 1], gb.gb0[..., 2], gb.gb0[..., 3],
        gb.gb1[..., 0], gb.gb1[..., 1], gb.gb1[..., 2], gb.gb1[..., 3],
        gb.depth,
    ]
    if shadow_visibility is not None:
        planes.append(shadow_visibility)
    planes = jnp.stack(planes)
    if Hp != H:
        pad = jnp.zeros((planes.shape[0], Hp - H, W), jnp.float32)
        pad = pad.at[_P_DEPTH].set(1.0)
        planes = jnp.concatenate([planes, pad], axis=1)
    if Wp != W:
        padw = jnp.zeros((planes.shape[0], Hp, Wp - W), jnp.float32)
        padw = padw.at[_P_DEPTH].set(1.0)
        planes = jnp.concatenate([planes, padw], axis=2)
    NPL = planes.shape[0]

    li = lights
    L = max(li.num_point, 1)
    light_table = build_light_table(li)
    l_overflow = jnp.zeros((), jnp.int32)
    if li.num_point:
        tl = cull_lights_to_tiles(
            gb.depth, li, cfg, view_proj, tile=(TH, TW),
            max_per_tile=min(L, cfg.max_live_lights_per_tile),
            y_offset=y_offset, full_height=full_height,
        )
        light_ids = tl.indices.reshape(NT, -1)
        light_counts = tl.counts.reshape(NT)
        l_overflow = tl.overflow
    else:
        light_ids = jnp.zeros((NT, 1), jnp.int32)
        light_counts = jnp.zeros((NT,), jnp.int32)
    # CHUNK-multiple padding is load-bearing for memory safety — see
    # fused.pad_light_ids_to_chunk (the single definition both kernels share).
    light_ids = pad_light_ids_to_chunk(light_ids)
    Lk = light_ids.shape[1]

    from ..xmath import normalize_safe

    ldir = normalize_safe(-li.direction)  # same guard as every other path
    uniforms = jnp.zeros((U_SIZE,), jnp.float32)
    uniforms = uniforms.at[U_INV_VP : U_INV_VP + 16].set(
        jnp.linalg.inv(view_proj).reshape(-1)
    )
    uniforms = uniforms.at[U_EYE : U_EYE + 3].set(eye)
    uniforms = uniforms.at[U_LDIR : U_LDIR + 3].set(ldir)
    uniforms = uniforms.at[U_LCOLOR : U_LCOLOR + 3].set(li.color)
    uniforms = uniforms.at[U_AMBIENT].set(cfg.ambient)
    uniforms = uniforms.at[U_W].set(float(W))
    uniforms = uniforms.at[U_H].set(float(FH))
    uniforms = uniforms.at[U_Y0].set(jnp.asarray(y_offset, jnp.float32))

    # Group size: plane blocks are small, so usually a whole tile row per step.
    G = ntx
    while G > 1 and (
        (NPL + 3) * TH * G * TW * 4 * 2 > (6 << 20) or ntx % G
    ):
        G -= 1
    ngx = ntx // G

    kernel = functools.partial(
        _shade_kernel, tile_h=TH, tile_w=TW, ntx=ntx, gamma=cfg.gamma,
        group=G, has_vis=shadow_visibility is not None,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ngx),
        in_specs=[
            pl.BlockSpec(
                (NPL, TH, G * TW), lambda ty, gx, *_: (0, ty, gx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light table (whole)
            pl.BlockSpec(                            # per-step light-id lists
                (1, Lk, G), lambda ty, gx, *_, _g=ngx: (ty * _g + gx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, TH, G * TW), lambda ty, gx, *_: (0, ty, gx),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(
        light_counts, uniforms, planes, light_table,
        light_ids.reshape(nty * ngx, G, Lk).transpose(0, 2, 1),
    )
    hdr = out[:, :H, :W].transpose(1, 2, 0)
    if return_overflow:
        return hdr, l_overflow
    return hdr

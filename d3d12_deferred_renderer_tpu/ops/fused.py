"""Fused tiled-deferred mono-kernel: raster -> G-buffer -> lighting -> tonemap,
one Pallas program, G-buffer lives ONLY in VMEM.

The staged pipeline (raster_pallas -> gbuffer -> lighting -> post) writes ~70 MB of
intermediate fragment/G-buffer planes to HBM per 1080p frame and reads them back —
that traffic is the frame-time floor once compute is culled down.  This kernel is
the classic tile-based deferred architecture mapped to the TPU memory hierarchy:
each grid step rasterizes one screen tile into VMEM-resident registers, applies the
reference's G-buffer quantization in place (UNORM8/10/2 parity — geometry.hlsl:51-52
+ main.cpp:476-488), shades it with the tile's culled light list, tonemaps, and
writes only the final color planes.  HBM traffic per tile: binned triangle records
in, 3 color planes out.

Equivalence contract (tested): identical to the staged path
encode_gbuffer -> shade_pbr_tiled -> reinhard -> gamma for configurations without
shadows / normal mapping / bloom / FXAA (those need cross-tile or HDR state and run
staged).

Light culling is EXACT and depth-aware, and happens in XLA: a depth-only Pallas
prepass (rasterize_depth, bit-identical to the main kernel's depth) feeds
cull_lights_to_tiles on the kernel's tile grid, capped at the full light count so
a list can never drop a contributing light.  The kernel then loops exactly each
tile's live-light count: no per-light mask reads, no branches — O(live lights)
instead of O(L).  (An earlier design derived conservative tile depth bounds from
the binned triangles' z ranges to avoid the prepass; NDC z near 1 maps tiny
z-ranges to enormous world-depth ranges, so it kept ~50 of 256 lights/tile where
the exact cull keeps ~1 — the prepass pays for itself many times over.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RendererConfig
from ..scene import SceneState
from .lighting import cull_lights_to_tiles
from .raster_pallas import bin_triangles
from .transform import (
    TRI_AREA,
    TRI_MESH_ID,
    TRI_N0,
    TRI_RW0,
    TRI_RW1,
    TRI_RW2,
    TRI_VALID,
    TRI_X0,
    TRI_X1,
    TRI_X2,
    TRI_Y0,
    TRI_Y1,
    TRI_Y2,
    TRI_Z0,
    TRI_Z1,
    TRI_Z2,
    TRI_STRIDE,
    setup_frame_triangles,
)

# uniforms layout (scalar-prefetch f32 vector)
U_INV_VP = 0      # 16 floats, row-major, row-vector convention
U_EYE = 16        # 3
U_LDIR = 19       # 3 (normalized -lightDirection, i.e. direction TOWARD the light)
U_LCOLOR = 22     # 3
U_AMBIENT = 25
U_W = 26
U_H = 27
U_TONEMAP = 28    # 1.0 = reinhard, 0.0 = none
U_SIZE = 32


def _quant(x, bits):
    scale = float((1 << bits) - 1)
    return jnp.round(jnp.clip(x, 0.0, 1.0) * scale) / scale


def _fused_kernel(
    tri_counts, light_counts, uniforms,
    *refs,
    tile_h, tile_w, ntx, gamma, indirect,
):
    if indirect:
        idx_ref, packed_ref, mats_ref, lights_ref, lids_ref, out_ref = refs

        def fetch_tri(k):
            return packed_ref[idx_ref[0, k, 0], :]
    else:
        tris_ref, mats_ref, lights_ref, lids_ref, out_ref = refs

        def fetch_tri(k):
            return tris_ref[0, k, :]

    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile = ty * ntx + tx

    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    py = (ty * tile_h).astype(jnp.float32) + 0.5 + iy
    px = (tx * tile_w).astype(jnp.float32) + 0.5 + ix

    # ---------------- raster + material fetch ----------------
    def raster_body(k, carry):
        depth, nx, ny, nz, ar, ag, ab, metal, rough, mid = carry
        t = fetch_tri(k)

        x0v, y0v, x1v, y1v = t[TRI_X0], t[TRI_Y0], t[TRI_X1], t[TRI_Y1]
        x2v, y2v = t[TRI_X2], t[TRI_Y2]

        def edge(ax, ay, bx, by):
            A = ay - by
            B = bx - ax
            C = ax * by - bx * ay
            e = A * px + B * py + C
            dx = bx - ax
            dy = by - ay
            tl = ((dy == 0.0) & (dx > 0.0)) | (dy < 0.0)
            return (e > 0.0) | ((e == 0.0) & tl), e

        c0, e0 = edge(x1v, y1v, x2v, y2v)
        c1, e1 = edge(x2v, y2v, x0v, y0v)
        c2, e2 = edge(x0v, y0v, x1v, y1v)
        covered = c0 & c1 & c2

        inv_area = 1.0 / t[TRI_AREA]
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = e2 * inv_area
        z = b0 * t[TRI_Z0] + b1 * t[TRI_Z1] + b2 * t[TRI_Z2]
        passes = covered & (t[TRI_VALID] > 0.0) & (z < depth) & (z >= 0.0) & (z <= 1.0)

        rw = b0 * t[TRI_RW0] + b1 * t[TRI_RW1] + b2 * t[TRI_RW2]
        inv_rw = 1.0 / jnp.where(rw == 0.0, 1.0, rw)

        def interp3(o):
            return (b0 * t[o] + b1 * t[o + 3] + b2 * t[o + 6]) * inv_rw

        mesh = t[TRI_MESH_ID].astype(jnp.int32)
        mat = mats_ref[mesh, :]

        return (
            jnp.where(passes, z, depth),
            jnp.where(passes, interp3(TRI_N0), nx),
            jnp.where(passes, interp3(TRI_N0 + 1), ny),
            jnp.where(passes, interp3(TRI_N0 + 2), nz),
            jnp.where(passes, mat[0], ar),
            jnp.where(passes, mat[1], ag),
            jnp.where(passes, mat[2], ab),
            jnp.where(passes, mat[3], metal),
            jnp.where(passes, mat[4], rough),
            jnp.where(passes, 1.0, mid),
        )

    shape = (tile_h, tile_w)
    z1 = jnp.ones(shape, jnp.float32)
    z0 = jnp.zeros(shape, jnp.float32)
    carry = (z1, z0, z0, z0, z0, z0, z0, z0, z0, z0 - 1.0)
    n_tris = tri_counts[tile]
    depth, nx, ny, nz, ar, ag, ab, metal, rough, mid = jax.lax.fori_loop(
        0, n_tris, raster_body, carry
    )
    covered = mid >= 0.0

    # ---------------- G-buffer quantization parity (in VMEM) ----------------
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv_nlen = 1.0 / jnp.where(nlen == 0.0, 1.0, nlen)
    enc_x = _quant(jnp.where(covered, nx * inv_nlen, 0.0) * 0.5 + 0.5, 10)
    enc_y = _quant(jnp.where(covered, ny * inv_nlen, 0.0) * 0.5 + 0.5, 10)
    enc_z = _quant(jnp.where(covered, nz * inv_nlen, 0.0) * 0.5 + 0.5, 10)
    ar = _quant(jnp.where(covered, ar, 0.0), 8)
    ag = _quant(jnp.where(covered, ag, 0.0), 8)
    ab = _quant(jnp.where(covered, ab, 0.0), 8)
    metal = _quant(jnp.where(covered, metal, 0.0), 8)
    rough = _quant(jnp.where(covered, rough, 0.0), 2)

    # Decode (lighting.hlsl:34-40): sRGB -> linear, normal re-normalize.
    alb = jnp.stack([ar, ag, ab])  # [3, th, tw]
    alb = jnp.power(jnp.maximum(alb, 0.0), gamma)
    dx_ = enc_x * 2.0 - 1.0
    dy_ = enc_y * 2.0 - 1.0
    dz_ = enc_z * 2.0 - 1.0
    dlen = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    inv_dlen = 1.0 / jnp.where(dlen == 0.0, 1.0, dlen)
    n = jnp.stack([dx_ * inv_dlen, dy_ * inv_dlen, dz_ * inv_dlen])

    # ---------------- world position from depth ----------------
    W = uniforms[U_W]
    H = uniforms[U_H]
    ndc_x = px * (2.0 / W) - 1.0
    ndc_y = 1.0 - py * (2.0 / H)

    def ivp(i, j):
        return uniforms[U_INV_VP + 4 * i + j]

    hx = ndc_x * ivp(0, 0) + ndc_y * ivp(1, 0) + depth * ivp(2, 0) + ivp(3, 0)
    hy = ndc_x * ivp(0, 1) + ndc_y * ivp(1, 1) + depth * ivp(2, 1) + ivp(3, 1)
    hz = ndc_x * ivp(0, 2) + ndc_y * ivp(1, 2) + depth * ivp(2, 2) + ivp(3, 2)
    hw = ndc_x * ivp(0, 3) + ndc_y * ivp(1, 3) + depth * ivp(2, 3) + ivp(3, 3)
    inv_hw = 1.0 / jnp.where(hw == 0.0, 1.0, hw)
    world = jnp.stack([hx * inv_hw, hy * inv_hw, hz * inv_hw])  # [3, th, tw]

    eye = jnp.stack(
        [jnp.full(shape, uniforms[U_EYE + i], jnp.float32) for i in range(3)]
    )
    v = eye - world
    vlen = jnp.sqrt(jnp.sum(v * v, 0))
    v = v / jnp.where(vlen == 0.0, 1.0, vlen)

    def dot3(a, b):
        return jnp.sum(a * b, axis=0)

    def ggx(l):
        """Cook-Torrance GGX * NdotL, mirrors lighting.py::_ggx_brdf."""
        h = v + l
        hlen = jnp.sqrt(jnp.sum(h * h, 0))
        h_ = h / jnp.where(hlen == 0.0, 1.0, hlen)
        ndl = jnp.maximum(dot3(n, l), 0.0)
        ndv = jnp.maximum(dot3(n, v), 1e-4)
        ndh = jnp.maximum(dot3(n, h_), 0.0)
        vdh = jnp.maximum(dot3(v, h_), 0.0)

        alpha = jnp.maximum(rough * rough, 1e-3)
        a2 = alpha * alpha
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        D = a2 / (jnp.pi * denom * denom)

        kk = (rough + 1.0) ** 2 / 8.0
        g1 = ndv / (ndv * (1.0 - kk) + kk)
        g2 = ndl / (ndl * (1.0 - kk) + kk + 1e-7)
        G = g1 * g2

        f0 = 0.04 * (1.0 - metal) + alb * metal
        F = f0 + (1.0 - f0) * jnp.power(1.0 - vdh, 5.0)

        spec = (D * G) * F / (4.0 * ndv * ndl + 1e-4)
        kd = (1.0 - F) * (1.0 - metal)
        diffuse = kd * alb / jnp.pi
        return (diffuse + spec) * ndl

    # Directional light.
    ldir = jnp.stack(
        [jnp.full(shape, uniforms[U_LDIR + i], jnp.float32) for i in range(3)]
    )
    lcol = jnp.stack(
        [jnp.full(shape, uniforms[U_LCOLOR + i], jnp.float32) for i in range(3)]
    )
    radiance = ggx(ldir) * lcol

    # ---------------- per-tile culled light loop ----------------
    # Light culling happens OUTSIDE the kernel: a depth-only prepass kernel
    # (rasterize_depth — bit-identical depth to this kernel's raster loop) feeds
    # the exact depth-aware cull (cull_lights_to_tiles) on this tile grid.  The
    # kernel receives this tile's compacted light-id list + count and runs the
    # full GGX body exactly `count` times: O(live lights) with zero per-light
    # mask reads or branches — the previous in-kernel cull + mask-predicated
    # scan over ALL L lights was the kernel's largest cost.
    def light_body(i, acc):
        lid = lids_ref[0, i, 0]
        row = lights_ref[lid, :]
        lpos = jnp.stack(
            [jnp.full(shape, row[c_], jnp.float32) for c_ in range(3)]
        )
        to_l = lpos - world
        dist = jnp.sqrt(jnp.sum(to_l * to_l, 0))
        ldir_ = to_l / jnp.maximum(dist, 1e-6)
        radius = row[3]
        intensity = row[7]
        window = jnp.clip(1.0 - (dist / radius) ** 4, 0.0, 1.0) ** 2
        atten = intensity * window / (dist * dist + 1.0)
        col = jnp.stack(
            [jnp.full(shape, row[4 + c_], jnp.float32) for c_ in range(3)]
        )
        return acc + ggx(ldir_) * col * atten

    radiance = jax.lax.fori_loop(0, light_counts[tile], light_body, radiance)

    out = radiance + uniforms[U_AMBIENT] * alb
    out = jnp.where((depth < 1.0)[None], out, 0.0)

    # ---------------- post: tonemap + gamma ----------------
    tm = uniforms[U_TONEMAP]
    out = jnp.where(tm > 0.5, out / (1.0 + out), out)
    out = jnp.power(jnp.maximum(out, 0.0), 1.0 / gamma)

    out_ref[0] = out[0]
    out_ref[1] = out[1]
    out_ref[2] = out[2]


def render_fused(
    state: SceneState, cfg: RendererConfig, interpret: bool = False
) -> jnp.ndarray:
    """Fused tiled-deferred frame -> uint8 [H, W, 3] (PBR, no shadow/bump/bloom)."""
    H, W = cfg.height, cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    tris, view_proj = setup_frame_triangles(state, cfg)
    valid = tris.packed[:, TRI_VALID] > 0.0
    binned = bin_triangles(tris.packed, tris.aabb, valid, cfg)
    K = binned.idx.shape[1]
    T = tris.packed.shape[0]
    from .raster_pallas import VMEM_INDIRECTION_SLOTS, rasterize_depth

    indirect = T <= VMEM_INDIRECTION_SLOTS
    if not indirect:
        # Pre-gather per-tile records ONCE; the depth prepass and the main
        # kernel both stream the same array.
        binned = binned.with_records(tris.packed)

    mats = state.materials
    M = mats.albedo.shape[0]
    mat_table = jnp.zeros((max(M, 8), 8), jnp.float32)
    mat_table = mat_table.at[:M, 0:3].set(mats.albedo)
    mat_table = mat_table.at[:M, 3].set(mats.metalness)
    mat_table = mat_table.at[:M, 4].set(mats.roughness)

    li = state.lights
    L = max(li.num_point, 1)
    light_table = jnp.zeros((L, 8), jnp.float32)
    if li.num_point:
        light_table = light_table.at[:, 0:3].set(li.point_position)
        light_table = light_table.at[:, 3].set(li.point_radius)
        light_table = light_table.at[:, 4:7].set(li.point_color)
        light_table = light_table.at[:, 7].set(li.point_intensity)

    # Per-tile light lists: depth-only prepass -> EXACT depth-aware culling on
    # the kernel's tile grid, capped at L (a list can never drop a light).  The
    # kernel then loops each tile's count, never the full light set.
    NT = nty * ntx
    if li.num_point:
        depth_pre = rasterize_depth(
            tris.packed, tris.aabb, cfg, binned=binned, interpret=interpret
        )
        tl = cull_lights_to_tiles(
            depth_pre, li, cfg, view_proj, tile=(TH, TW), max_per_tile=L
        )
        light_ids = tl.indices.reshape(NT, -1)
        light_counts = tl.counts.reshape(NT)
    else:
        light_ids = jnp.zeros((NT, 1), jnp.int32)
        light_counts = jnp.zeros((NT,), jnp.int32)
    Lk = light_ids.shape[1]

    ldir = -li.direction
    ldir = ldir / jnp.linalg.norm(ldir)
    uniforms = jnp.zeros((U_SIZE,), jnp.float32)
    uniforms = uniforms.at[U_INV_VP : U_INV_VP + 16].set(
        jnp.linalg.inv(view_proj).reshape(-1)
    )
    uniforms = uniforms.at[U_EYE : U_EYE + 3].set(state.camera.eye)
    uniforms = uniforms.at[U_LDIR : U_LDIR + 3].set(ldir)
    uniforms = uniforms.at[U_LCOLOR : U_LCOLOR + 3].set(li.color)
    uniforms = uniforms.at[U_AMBIENT].set(cfg.ambient)
    uniforms = uniforms.at[U_W].set(float(W))
    uniforms = uniforms.at[U_H].set(float(H))
    uniforms = uniforms.at[U_TONEMAP].set(1.0 if cfg.tonemap == "reinhard" else 0.0)

    kernel = functools.partial(
        _fused_kernel, tile_h=TH, tile_w=TW, ntx=ntx, gamma=cfg.gamma,
        indirect=indirect,
    )
    if indirect:
        tri_specs = [
            pl.BlockSpec((1, K, 1), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                         memory_space=pltpu.VMEM),  # per-tile triangle ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole packed array (VMEM)
        ]
        tri_args = (binned.idx[..., None], tris.packed)
    else:
        tri_specs = [
            pl.BlockSpec((1, K, TRI_STRIDE), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        tri_args = (binned.records,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nty, ntx),
        in_specs=tri_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mat table (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light table (whole)
            pl.BlockSpec(                            # per-tile light-id list
                (1, Lk, 1), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (3, TH, TW), lambda ty, tx, *_: (0, ty, tx), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(
        binned.counts[:, 0], light_counts, uniforms,
        *tri_args, mat_table, light_table, light_ids[..., None],
    )

    color = out[:, :H, :W].transpose(1, 2, 0)
    return jnp.round(jnp.clip(color, 0.0, 1.0) * 255.0).astype(jnp.uint8)

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

Equivalence contract (tested): matches the staged path
(raster -> [bump] -> encode_gbuffer -> [shadow map + PCF] -> shade_pbr_tiled ->
[bloom] -> tonemap -> gamma) within 1 u8 LSB for every PBR configuration,
including the config-4 feature stack: shadow visibility enters as an input
plane computed from the prepass depth, normal mapping runs in-kernel on
tile-block derivatives (the staged path uses the same block semantics —
ops/bump.py), and bloom flips the kernel to linear-HDR output with the XLA
post chain finishing outside.  FXAA (a full-frame screen-space pass) stays
with the caller either way.

Light culling is EXACT and depth-aware, and happens in XLA: a depth-only Pallas
prepass (rasterize_depth, bit-identical to the main kernel's depth) feeds
cull_lights_to_tiles on the kernel's tile grid.  The per-tile list length is
cfg.max_live_lights_per_tile with a LOUD overflow counter — never a silent
drop.  The kernel loops each tile's live lights in sublane chunks of CHUNK:
no per-light mask reads or scalar fetches — O(live lights) vector work instead
of O(L) scalar floor.  (An earlier design derived conservative tile depth
bounds from the binned triangles' z ranges to avoid the prepass; NDC z near 1
maps tiny z-ranges to enormous world-depth ranges, so it kept ~50 of 256
lights/tile where the exact cull keeps ~1-20 — the prepass pays for itself.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import xmath
from ..config import RendererConfig
from ..scene import SceneState
from .lighting import cull_lights_to_tiles
from .raster_pallas import (
    CHUNK,
    STREAM_COPY_ROWS,
    STREAM_SLACK,
    _chunk_raster,
    _copy_group_segment,
    _copy_group_segment_db,
    _flat_pixels,
    _indirect_fetch,
    _pick_group_stream,
    _stream_fetch,
    bin_triangles,
)
from .transform import (
    TRI_MESH_ID,
    TRI_N0,
    TRI_UV0,
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
U_Y0 = 29         # band row offset (screen-sharded path; 0 for full frames)
U_SIZE = 32


# The staged path's G-buffer quantization — the fused/staged 1-LSB parity
# REQUIRES the identical formula, so it is imported, not re-implemented.
from .gbuffer import quantize_unorm as _quant  # noqa: E402


def build_light_table(li) -> jnp.ndarray:
    """[max(L, 1), 8] point-light rows (pos.xyz, radius, color.rgb, intensity)
    — the layout both Mosaic shading kernels index by per-tile light id.
    Shared by render_fused and lighting_pallas.shade_pbr_tiled_pallas."""
    L = max(li.num_point, 1)
    t = jnp.zeros((L, 8), jnp.float32)
    if li.num_point:
        t = t.at[:, 0:3].set(li.point_position)
        t = t.at[:, 3].set(li.point_radius)
        t = t.at[:, 4:7].set(li.point_color)
        t = t.at[:, 7].set(li.point_intensity)
    return t


def pad_light_ids_to_chunk(light_ids: jnp.ndarray) -> jnp.ndarray:
    """Pad the per-tile light-id list axis to a CHUNK multiple.

    LOAD-BEARING for memory safety: the kernels' chunk loop always reads all
    CHUNK sublanes of a block and compiled Mosaic does NO bounds checking —
    an unpadded Lk % CHUNK != 0 is a wild VMEM read for the tail sublanes.
    Padding ids point at light 0 (always present) and are masked by the
    slot < count test."""
    Lk = light_ids.shape[1]
    Lk_p = -(-Lk // CHUNK) * CHUNK
    if Lk_p != Lk:
        light_ids = jnp.pad(light_ids, ((0, 0), (0, Lk_p - Lk)))
    return light_ids


# Raster channel specs for _chunk_raster: interpolated normals + the mesh id
# (+ interpolated uv when in-kernel bump mapping needs it).  Materials are NOT
# raster channels: the winning mesh id selects the (already quantized +
# sRGB-decoded) material row AFTER the raster loop via a static where-chain
# over the small table — 5 fewer winner-selects per chunk, and the record
# stream stays the plain 32-column TRI_* layout (no per-frame extended copy of
# the packed array).
_FUSED_CHANNELS = (
    ("interp", TRI_N0, 3, 0.0),
    ("interp", TRI_N0 + 1, 3, 0.0),
    ("interp", TRI_N0 + 2, 3, 0.0),
    ("const", TRI_MESH_ID, -1.0),  # -1 = background
)
_FUSED_CHANNELS_BUMP = (
    ("interp", TRI_N0, 3, 0.0),
    ("interp", TRI_N0 + 1, 3, 0.0),
    ("interp", TRI_N0 + 2, 3, 0.0),
    ("interp", TRI_UV0, 2, 0.0),
    ("interp", TRI_UV0 + 1, 2, 0.0),
    ("const", TRI_MESH_ID, -1.0),  # -1 = background
)


def _world_from_depth(uniforms, px, py, depth):
    """Reconstruct world position planes from depth + pixel centers (the same
    composed inverse-view-projection the shading body uses)."""
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
    return hx * inv_hw, hy * inv_hw, hz * inv_hw


def _fused_kernel(
    tri_counts, light_counts, uniforms, *refs,
    tile_h, tile_w, ntx, gamma, indirect, group, n_mats,
    max_rows=0, local_clamp=0, bump=None, has_vis=False, hdr_out=False,
    ik_slots=0, aux_out=False, db=False,
):
    ty = pl.program_id(0)
    gx = pl.program_id(1)
    tile0 = ty * ntx + gx * group
    ik = ik_slots > 0  # in-kernel light culling (see render_fused docstring)

    if ik:
        # ids scratch is appended LAST in scratch_shapes.
        ids_scr = refs[-1]
        refs = refs[:-1]

    if indirect:
        # With ik_slots the lids slot holds the transposed light-param rows
        # [4, Lp] (x, y, z, radius^2) the cull tests against instead of the
        # per-tile id lists (there are none — the kernel builds its own).
        idx_ref, packed_ref, lights_ref, lids_ref, mats_ref = refs[:5]
        rest = refs[5:]

        def fetch_for(g):
            return _indirect_fetch(idx_ref, packed_ref, g)
    else:
        offs_ref = refs[0]
        stream_ref, lights_ref, lids_ref, mats_ref = refs[1:5]
        rest = refs[5:]
        scratch, sem = rest[-2:]
        rest = rest[:-2]
        if db:
            start, soff = _copy_group_segment_db(
                offs_ref, stream_ref, scratch, sem, ntx, group, max_rows
            )
        else:
            start = _copy_group_segment(
                offs_ref, stream_ref, scratch, sem, tile0, group, max_rows
            )
            soff = 0

        def fetch_for(g):
            # Clamp keeps scratch reads in bounds under loud stream overflow.
            local = jnp.minimum(offs_ref[tile0 + g] - start, local_clamp)
            return _stream_fetch(scratch, soff + local)

    if has_vis:
        vis_ref = rest[0]
        rest = rest[1:]
    out_ref = rest[0]
    ovf_ref = rest[1] if ik else None

    # ------------- raster (chunked-sublane, per sub-tile of the group row) ------
    # Each grid step owns `group` adjacent tiles: raster loops run per sub-tile
    # (bins are per tile) but everything per-pixel below — G-buffer decode,
    # world-position reconstruction, GGX — vectorizes across the whole row,
    # amortizing the per-step fixed overhead that dominated the per-tile grid.
    channels = _FUSED_CHANNELS_BUMP if bump is not None else _FUSED_CHANNELS
    per_g = []
    world_g = []  # bump path: world planes, reused by _shade_row
    yoff = uniforms[U_Y0].astype(jnp.int32)  # band row offset (0 full-frame)
    for g in range(group):
        txi = gx * group + g
        pxf, pyf = _flat_pixels(yoff, tile_h, tile_w, txi)
        flat = _chunk_raster(
            fetch_for(g), tri_counts[ty * ntx + txi], pxf, pyf, channels
        )
        planes = [p.reshape(tile_h, tile_w) for p in flat]
        if bump is not None:
            from .bump import bump_planar

            depth_t, nx_t, ny_t, nz_t, u_t, v_t, mid_t = planes
            px_t = pxf.reshape(tile_h, tile_w)
            py_t = pyf.reshape(tile_h, tile_w)
            world_t = _world_from_depth(uniforms, px_t, py_t, depth_t)
            world_g.append(world_t)
            # Out-of-image tile padding counts as background for the derivative
            # validity test — matches the staged path's -1 padding exactly.
            mid_b = jnp.where(
                (px_t < uniforms[U_W]) & (py_t < uniforms[U_H]), mid_t, -1.0
            )
            nx_t, ny_t, nz_t = bump_planar(
                world_t, (u_t, v_t), (nx_t, ny_t, nz_t), mid_b,
                bump[0], bump[1],
            )
            planes = [depth_t, nx_t, ny_t, nz_t, mid_t]
        per_g.append(planes)
    if group == 1:
        depth, nx, ny, nz, mid = per_g[0]
    else:
        depth, nx, ny, nz, mid = (
            jnp.concatenate([sub[i] for sub in per_g], axis=1) for i in range(5)
        )
    world_row = None
    if bump is not None:
        world_row = tuple(
            world_g[0][i] if group == 1
            else jnp.concatenate([w[i] for w in world_g], axis=1)
            for i in range(3)
        )
    covered = mid >= 0.0

    # ---------------- in-kernel light culling (ik_slots > 0) ----------------
    # The kernel culls the full light set against this row's EXACT geometry
    # bounds: covered pixels split into two eye-distance slabs (one world AABB
    # per slab would balloon across a tile spanning foreground + background,
    # the same reason the XLA cull depth-slices), each slab's world AABB is
    # the componentwise min/max of its pixels' reconstructed world positions,
    # and a light is live iff its influence sphere touches either box.  Exact
    # like the XLA cull (a pixel within a light's radius lies inside its
    # slab's box; the falloff window is zero at the radius), and TIGHTER (the
    # pixel AABB is a subset of the unprojected tile-corner box).  Live ids
    # compact to ascending order — the XLA lists' order — via a rank match,
    # so the chunk loop below runs unchanged from VMEM scratch.
    counts_ik = None
    if ik:
        if world_row is None:
            # Same reconstruction _shade_row would do — computed once here and
            # passed down so the inverse-VP work isn't paid twice.
            shape_r = (tile_h, tile_w * group)
            iy_r = jax.lax.broadcasted_iota(jnp.int32, shape_r, 0).astype(jnp.float32)
            ix_r = jax.lax.broadcasted_iota(jnp.int32, shape_r, 1).astype(jnp.float32)
            py_r = uniforms[U_Y0] + (ty * tile_h).astype(jnp.float32) + 0.5 + iy_r
            px_r = (gx * (group * tile_w)).astype(jnp.float32) + 0.5 + ix_r
            world_row = _world_from_depth(uniforms, px_r, py_r, depth)
        BIG = jnp.float32(3.0e38)
        lt_x = lids_ref[0:1, :]
        lt_y = lids_ref[1:2, :]
        lt_z = lids_ref[2:3, :]
        lt_r2 = lids_ref[3:4, :]
        lane_ids = jax.lax.broadcasted_iota(jnp.int32, lt_x.shape, 1)
        slot_col = jax.lax.broadcasted_iota(
            jnp.int32, (ik_slots, 1), 0
        ).astype(jnp.float32)
        # Inclusive-rank operator: rank = live @ M with M[m, l] = (m <= l) —
        # cumsum has no Mosaic lowering, but a [1, Lp] x [Lp, Lp] f32 matmul
        # rides the MXU and is exact for any count < 2^24.
        Lp = lt_x.shape[1]
        rank_op = (
            jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
        ).astype(jnp.float32)
        ex, ey, ez = uniforms[U_EYE], uniforms[U_EYE + 1], uniforms[U_EYE + 2]
        counts_ik = []
        ovf_total = jnp.zeros((), jnp.int32)
        for g in range(group):
            sl = slice(g * tile_w, (g + 1) * tile_w)
            cov_g = covered[:, sl]
            wx = world_row[0][:, sl]
            wy = world_row[1][:, sl]
            wz = world_row[2][:, sl]
            dx = wx - ex
            dy = wy - ey
            dz = wz - ez
            d2 = dx * dx + dy * dy + dz * dz
            dmin = jnp.min(jnp.where(cov_g, d2, BIG))
            dmax = jnp.max(jnp.where(cov_g, d2, -BIG))
            dmid = 0.5 * (dmin + dmax)
            live = None
            for m in (cov_g & (d2 <= dmid), cov_g & (d2 > dmid)):
                # Empty slab: bounds stay at +/-BIG, every distance overflows
                # to +inf and no light tests live (no NaNs: BIG - finite = BIG).
                bnx = jnp.min(jnp.where(m, wx, BIG))
                bxx = jnp.max(jnp.where(m, wx, -BIG))
                bny = jnp.min(jnp.where(m, wy, BIG))
                bxy = jnp.max(jnp.where(m, wy, -BIG))
                bnz = jnp.min(jnp.where(m, wz, BIG))
                bxz = jnp.max(jnp.where(m, wz, -BIG))
                ddx = jnp.maximum(jnp.maximum(bnx - lt_x, lt_x - bxx), 0.0)
                ddy = jnp.maximum(jnp.maximum(bny - lt_y, lt_y - bxy), 0.0)
                ddz = jnp.maximum(jnp.maximum(bnz - lt_z, lt_z - bxz), 0.0)
                dist2 = ddx * ddx + ddy * ddy + ddz * ddz
                hit = dist2 <= lt_r2  # lane padding carries r^2 = -1: never live
                live = hit if live is None else (live | hit)
            live_f = live.astype(jnp.float32)
            rank = jnp.dot(
                live_f, rank_op, preferred_element_type=jnp.float32
            )  # [1, Lp], inclusive cumsum
            cnt = jnp.sum(live_f).astype(jnp.int32)
            # Slot j holds the id whose live-rank is j+1 (ascending ids).
            eq = (rank == (slot_col + 1.0)) & live  # [S, Lp]
            ids = jnp.sum(jnp.where(eq, lane_ids, 0), axis=1, keepdims=True)
            ids_scr[:, g : g + 1] = ids
            counts_ik.append(jnp.minimum(cnt, ik_slots))
            ovf_total = ovf_total + (cnt > ik_slots).astype(jnp.int32)
        ovf_ref[ty, gx] = ovf_total

    # Materials: static where-chain over the pre-quantized + sRGB-decoded table
    # (rows indexed by the winning mesh id; background mid=-1 matches no row and
    # keeps 0 — exactly the staged path's quantize-then-decode of a constant).
    zero = jnp.zeros_like(mid)
    ar, ag, ab, metal, rough = zero, zero, zero, zero, zero
    for m in range(n_mats):
        sel = mid == float(m)
        ar = jnp.where(sel, mats_ref[m, 0], ar)
        ag = jnp.where(sel, mats_ref[m, 1], ag)
        ab = jnp.where(sel, mats_ref[m, 2], ab)
        metal = jnp.where(sel, mats_ref[m, 3], metal)
        rough = jnp.where(sel, mats_ref[m, 4], rough)

    # ---------------- G-buffer quantization parity (in VMEM) ----------------
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv_nlen = 1.0 / jnp.where(nlen == 0.0, 1.0, nlen)
    enc_x = _quant(jnp.where(covered, nx * inv_nlen, 0.0) * 0.5 + 0.5, 10)
    enc_y = _quant(jnp.where(covered, ny * inv_nlen, 0.0) * 0.5 + 0.5, 10)
    enc_z = _quant(jnp.where(covered, nz * inv_nlen, 0.0) * 0.5 + 0.5, 10)

    # Decode (lighting.hlsl:34-40): normal re-normalize (albedo/metal/rough
    # arrive already quantized + linearized from the table).
    alb = jnp.stack([ar, ag, ab])  # [3, th, tw]
    dx_ = enc_x * 2.0 - 1.0
    dy_ = enc_y * 2.0 - 1.0
    dz_ = enc_z * 2.0 - 1.0
    dlen = jnp.sqrt(dx_ * dx_ + dy_ * dy_ + dz_ * dz_)
    inv_dlen = 1.0 / jnp.where(dlen == 0.0, 1.0, dlen)
    n = jnp.stack([dx_ * inv_dlen, dy_ * inv_dlen, dz_ * inv_dlen])

    # ---------------- shading (shared with the standalone lighting kernel) ---
    out = _shade_row(
        uniforms, lights_ref, None if ik else lids_ref, light_counts,
        ty, gx, group,
        tile_h, tile_w, ntx, depth, n, alb, metal, rough,
        vis=vis_ref[...] if has_vis else None, world=world_row,
        lids_scr=ids_scr if ik else None, counts_ik=counts_ik,
        skip_direct=aux_out,
    )

    # ---------------- post: tonemap + gamma (skipped when the caller needs the
    # linear HDR image, e.g. for bloom — post then runs in XLA outside) -------
    if not hdr_out:
        tm = uniforms[U_TONEMAP]
        out = jnp.where(tm > 0.5, out / (1.0 + out), out)
        out = jnp.power(jnp.maximum(out, 0.0), 1.0 / gamma)

    out_ref[0] = out[0]
    out_ref[1] = out[1]
    out_ref[2] = out[2]
    if aux_out:
        # Deferred-directional split: emit the planes the XLA side needs to
        # add vis * directional — the kernel's own depth (bit-identical to
        # the prepass depth, pinned invariant), the DECODED G-buffer normal
        # (post-bump, post 10-bit quantize/renormalize — exactly what
        # _shade_row shaded with), and the winning mesh id (the material
        # where-chain key; -1 background).
        out_ref[3] = depth
        out_ref[4] = n[0]
        out_ref[5] = n[1]
        out_ref[6] = n[2]
        out_ref[7] = mid


def _ggx_planar(l, n_, v_, alb_, metal_, rough_):
    """Cook-Torrance GGX * NdotL in channel-planar form ([3, ...] stacks),
    mirrors lighting.py::_ggx_brdf.  Shared by _shade_row's directional term
    and the deferred-directional resolve kernel."""

    def dot3(a, b):
        return jnp.sum(a * b, axis=0)

    h = v_ + l
    h2 = jnp.sum(h * h, 0)
    h_ = h * jnp.where(h2 == 0.0, 1.0, jax.lax.rsqrt(jnp.maximum(h2, 1e-38)))
    ndl = jnp.maximum(dot3(n_, l), 0.0)
    ndv = jnp.maximum(dot3(n_, v_), 1e-4)
    ndh = jnp.maximum(dot3(n_, h_), 0.0)
    vdh = jnp.maximum(dot3(v_, h_), 0.0)

    alpha = jnp.maximum(rough_ * rough_, 1e-3)
    a2 = alpha * alpha
    denom = ndh * ndh * (a2 - 1.0) + 1.0
    D = a2 / (jnp.pi * denom * denom)

    kk = (rough_ + 1.0) ** 2 / 8.0
    g1 = ndv / (ndv * (1.0 - kk) + kk)
    g2 = ndl / (ndl * (1.0 - kk) + kk + 1e-7)
    G = g1 * g2

    f0 = 0.04 * (1.0 - metal_) + alb_ * metal_
    u = 1.0 - vdh
    u2 = u * u
    F = f0 + (1.0 - f0) * (u2 * u2 * u)  # (1-vdh)^5 as multiplies, not exp/ln

    spec = (D * G) * F / (4.0 * ndv * ndl + 1e-4)
    kd = (1.0 - F) * (1.0 - metal_)
    diffuse = kd * alb_ * (1.0 / jnp.pi)
    return (diffuse + spec) * ndl


def _dir_resolve_kernel(
    uniforms, planes_ref, mats_ref, out_ref, *, tile_h, n_mats,
):
    """Deferred-directional resolve: hdr += vis * directional-GGX, computed
    from the mono-kernel's emitted planes (depth / decoded normal / mesh id)
    — the Mosaic replacement for the split's full-screen XLA pass, which
    measured ~1.8 ms at 1080p (the round-3 'wash').  Planes: 0-2 hdr, 3 depth,
    4-6 decoded normal, 7 mesh id (-1 background), 8 shadow visibility."""
    ty = pl.program_id(0)
    depth = planes_ref[3]
    n = jnp.stack([planes_ref[4], planes_ref[5], planes_ref[6]])
    mid = planes_ref[7]
    vis = planes_ref[8]
    shape = depth.shape

    iy = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    py = (ty * tile_h).astype(jnp.float32) + 0.5 + iy
    px = 0.5 + ix
    world = jnp.stack(list(_world_from_depth(uniforms, px, py, depth)))

    eye = jnp.stack(
        [jnp.full(shape, uniforms[U_EYE + i], jnp.float32) for i in range(3)]
    )
    v = eye - world
    v2 = jnp.sum(v * v, 0)
    v = v * jnp.where(v2 == 0.0, 1.0, jax.lax.rsqrt(jnp.maximum(v2, 1e-38)))

    # Materials: the same static where-chain over the pre-quantized table the
    # mono-kernel shaded with (mid -1 background matches no row, keeps 0).
    zero = jnp.zeros_like(mid)
    ar, ag, ab, metal, rough = zero, zero, zero, zero, zero
    for m in range(n_mats):
        sel = mid == float(m)
        ar = jnp.where(sel, mats_ref[m, 0], ar)
        ag = jnp.where(sel, mats_ref[m, 1], ag)
        ab = jnp.where(sel, mats_ref[m, 2], ab)
        metal = jnp.where(sel, mats_ref[m, 3], metal)
        rough = jnp.where(sel, mats_ref[m, 4], rough)
    alb = jnp.stack([ar, ag, ab])

    ldir = jnp.stack(
        [jnp.full(shape, uniforms[U_LDIR + i], jnp.float32) for i in range(3)]
    )
    direct = _ggx_planar(ldir, n, v, alb, metal, rough) * vis[None]
    covered = depth < 1.0
    for c in range(3):
        out_ref[c] = planes_ref[c] + jnp.where(
            covered, direct[c] * uniforms[U_LCOLOR + c], 0.0
        )


def directional_resolve_pallas(
    out_planes, vis, mat_table, uniforms, cfg, n_mats=None, interpret=False,
):
    """Run _dir_resolve_kernel over the mono-kernel's aux output planes.

    out_planes: [>=8, Hp, Wp] (hdr 3, depth, normal 3, mesh id) — the split
    kernel's output.  vis: [H, W] shadow visibility.  Returns hdr planes
    [3, Hp, Wp] with the directional term added (same contract as the XLA
    split block in render_fused, which remains the oracle path)."""
    _, Hp, Wp = out_planes.shape
    H, W = vis.shape
    if (H, W) != (Hp, Wp):
        vis = jnp.pad(
            vis, ((0, Hp - H), (0, Wp - W)), constant_values=1.0
        )
    planes = jnp.concatenate([out_planes[:8], vis[None]], axis=0)
    TH = cfg.tile_h
    kernel = functools.partial(
        _dir_resolve_kernel, tile_h=TH,
        n_mats=n_mats if n_mats is not None else mat_table.shape[0],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Hp // TH,),
            in_specs=[
                pl.BlockSpec(
                    (9, TH, Wp), lambda ty, *_: (0, ty, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # material table
            ],
            out_specs=pl.BlockSpec(
                (3, TH, Wp), lambda ty, *_: (0, ty, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        interpret=interpret,
    )(uniforms, planes, mat_table)


def _shade_row(
    uniforms, lights_ref, lids_ref, light_counts, ty, gx, group,
    tile_h, tile_w, ntx, depth, n, alb, metal, rough, vis=None, world=None,
    lids_scr=None, counts_ik=None, skip_direct=False,
):
    """Deferred shading of one group row -> masked HDR (3, th, group*tw).

    World position reconstruction from depth, directional GGX (attenuated by
    the shadow-visibility plane `vis` when given), the chunked-sublane point-
    light loop, and the ambient term — shared verbatim between the fused
    mono-kernel and the standalone G-buffer lighting kernel
    (ops/lighting_pallas.py), so both compiled paths shade identically.

    Pass precomputed `world` planes ((wx, wy, wz), each [th, group*tw]) to
    skip the reconstruction — the fused bump path already built them for the
    derivative blocks; recomputing per pixel would double the inverse-VP work."""
    shape = (tile_h, tile_w * group)
    if world is None:
        iy = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
        ix = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        # U_Y0 shifts rows into full-frame coordinates on the screen-sharded
        # band path (uniforms[U_H] is the FULL frame height); 0 whole-frame.
        py = uniforms[U_Y0] + (ty * tile_h).astype(jnp.float32) + 0.5 + iy
        px = (gx * (group * tile_w)).astype(jnp.float32) + 0.5 + ix
        world = _world_from_depth(uniforms, px, py, depth)
    world = jnp.stack(list(world))  # [3, th, tw]

    eye = jnp.stack(
        [jnp.full(shape, uniforms[U_EYE + i], jnp.float32) for i in range(3)]
    )
    v = eye - world
    v2 = jnp.sum(v * v, 0)
    v = v * jnp.where(v2 == 0.0, 1.0, jax.lax.rsqrt(jnp.maximum(v2, 1e-38)))

    ggx = _ggx_planar

    # Directional light (whole group row at once).
    if skip_direct:
        # Deferred-directional split: the caller adds vis * directional in
        # XLA from the kernel's emitted planes; the kernel accumulates only
        # the point lights + ambient.
        radiance = jnp.zeros((3,) + shape, jnp.float32)
    else:
        ldir = jnp.stack(
            [jnp.full(shape, uniforms[U_LDIR + i], jnp.float32) for i in range(3)]
        )
        lcol = jnp.stack(
            [jnp.full(shape, uniforms[U_LCOLOR + i], jnp.float32) for i in range(3)]
        )
        direct = ggx(ldir, n, v, alb, metal, rough)
        if vis is not None:
            direct = direct * vis[None]
        radiance = direct * lcol

    # ---------------- per-tile culled light loop (chunked-sublane) ----------
    # Light culling happens OUTSIDE the kernel (cull_lights_to_tiles on this
    # tile grid, fed by exact depth).  Lights then process CHUNK at a time as
    # VPU sublanes against the sub-tile's pixels flat in lanes — the raster
    # loop's treatment: the old per-light scalar row fetch + field broadcasts
    # (~300 cycles of scalar floor per light) become (CHUNK, 1) lane slices of
    # one gathered (CHUNK, 8) light block, with the full GGX body evaluated
    # for all CHUNK lights at once and reduced over the light sublanes.  Same
    # formulas as ggx() above — only the accumulation order within a chunk
    # differs (a sublane tree-sum), far below the u8 quantization step.
    P = tile_h * tile_w
    slot8 = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
    rad_parts = []
    for g in range(group):
        sl = slice(g * tile_w, (g + 1) * tile_w)

        def flat(a):
            return a[:, sl].reshape(1, P)

        wx, wy, wz = flat(world[0]), flat(world[1]), flat(world[2])
        nfx, nfy, nfz = flat(n[0]), flat(n[1]), flat(n[2])
        vfx, vfy, vfz = flat(v[0]), flat(v[1]), flat(v[2])
        albf = (flat(alb[0]), flat(alb[1]), flat(alb[2]))
        met_f = flat(metal)
        rgh_f = flat(rough)
        # In-kernel-cull mode: the compacted ids live in VMEM scratch (written
        # by the cull above, ascending order like the XLA lists) and the count
        # was reduced in-kernel; prefetch-list mode reads both from inputs.
        count = (
            counts_ik[g] if counts_ik is not None
            else light_counts[ty * ntx + gx * group + g]
        )

        # Light-independent terms, hoisted out of the chunk loop.
        ndv = jnp.maximum(nfx * vfx + nfy * vfy + nfz * vfz, 1e-4)
        alpha = jnp.maximum(rgh_f * rgh_f, 1e-3)
        a2 = alpha * alpha
        kk = (rgh_f + 1.0) ** 2 / 8.0
        g1 = ndv / (ndv * (1.0 - kk) + kk)
        f0 = tuple(0.04 * (1.0 - met_f) + c_ * met_f for c_ in albf)

        def light_chunk(c, acc, g=g, count=count, wx=wx, wy=wy, wz=wz,
                        nfx=nfx, nfy=nfy, nfz=nfz, vfx=vfx, vfy=vfy, vfz=vfz,
                        albf=albf, met_f=met_f, ndv=ndv, a2=a2, kk=kk, g1=g1,
                        f0=f0):
            if lids_scr is not None:
                rows = [
                    lights_ref[pl.ds(lids_scr[c * CHUNK + i, g], 1), :]
                    for i in range(CHUNK)
                ]
            else:
                rows = [
                    lights_ref[pl.ds(lids_ref[0, c * CHUNK + i, g], 1), :]
                    for i in range(CHUNK)
                ]
            lr = jnp.concatenate(rows, axis=0)  # (CHUNK, 8)

            def col(F):
                return lr[:, F : F + 1]

            ok = (slot8 + c * CHUNK) < count  # (CHUNK, 1)
            tx_ = col(0) - wx
            ty_ = col(1) - wy
            tz_ = col(2) - wz  # (CHUNK, P)
            # Squared-distance forms throughout: rsqrt instead of sqrt+divide,
            # (d2/r2)^2 instead of (dist/r)^4 (equal up to rounding; still
            # EXACTLY zero for d2 >= r2, so the light-cull exactness contract
            # holds), integer powers as multiplies instead of jnp.power's
            # exp/ln, and /pi folded to a constant multiply.  ~1-ULP value
            # moves vs the staged XLA oracle — inside the pinned <= 1-LSB
            # fused-vs-staged tolerance.  This body runs per light chunk per
            # covered pixel: the slow-transcendental count is the frame's
            # hottest multiplier.
            d2 = tx_ * tx_ + ty_ * ty_ + tz_ * tz_
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
            lx = tx_ * inv_d
            ly = ty_ * inv_d
            lz = tz_ * inv_d
            inv_r2 = 1.0 / (col(3) * col(3))  # (CHUNK, 1), not per pixel
            q = d2 * inv_r2
            wq = jnp.clip(1.0 - q * q, 0.0, 1.0)
            window = wq * wq
            atten = col(7) * window / (d2 + 1.0)
            atten = jnp.where(ok, atten, 0.0)

            hx = vfx + lx
            hy = vfy + ly
            hz = vfz + lz
            h2 = hx * hx + hy * hy + hz * hz
            ih = jnp.where(h2 == 0.0, 1.0, jax.lax.rsqrt(jnp.maximum(h2, 1e-38)))
            hx = hx * ih
            hy = hy * ih
            hz = hz * ih
            ndl = jnp.maximum(nfx * lx + nfy * ly + nfz * lz, 0.0)
            ndh = jnp.maximum(nfx * hx + nfy * hy + nfz * hz, 0.0)
            vdh = jnp.maximum(vfx * hx + vfy * hy + vfz * hz, 0.0)

            denom = ndh * ndh * (a2 - 1.0) + 1.0
            D = a2 / (jnp.pi * denom * denom)
            g2_ = ndl / (ndl * (1.0 - kk) + kk + 1e-7)
            G_ = g1 * g2_
            dg = D * G_
            spec_den = 4.0 * ndv * ndl + 1e-4
            u5 = 1.0 - vdh
            u5sq = u5 * u5
            f5 = u5sq * u5sq * u5
            scale = ndl * atten
            inv_pi = 1.0 / jnp.pi
            out = []
            for ch in range(3):
                F_ = f0[ch] + (1.0 - f0[ch]) * f5
                spec = dg * F_ / spec_den
                diffuse = (1.0 - F_) * (1.0 - met_f) * albf[ch] * inv_pi
                contrib = (diffuse + spec) * scale * col(4 + ch)
                out.append(acc[ch] + jnp.sum(contrib, axis=0, keepdims=True))
            return tuple(out)

        acc0 = tuple(flat(radiance[ch]) for ch in range(3))
        nchunks = (count + CHUNK - 1) // CHUNK
        accs = jax.lax.fori_loop(0, nchunks, light_chunk, acc0)
        rad_parts.append(
            jnp.stack([a.reshape(tile_h, tile_w) for a in accs])
        )
    radiance = rad_parts[0] if group == 1 else jnp.concatenate(rad_parts, axis=2)

    out = radiance + uniforms[U_AMBIENT] * alb
    return jnp.where((depth < 1.0)[None], out, 0.0)


def render_fused(
    state: SceneState, cfg: RendererConfig, interpret: bool = False,
    return_overflow: bool = False,
    band_h: int | None = None,
    y_offset=0,
):
    """Fused tiled-deferred frame -> uint8 [H, W, 3] (the PBR path, including
    the full config-4 feature stack):

    * ``cfg.shadows`` — the shadow map renders with the depth-only Pallas
      kernel, PCF visibility is computed in XLA from the light-culling
      prepass depth (bit-identical to the kernel's own depth plane), and the
      kernel consumes it as one extra input plane multiplying the
      directional term (same contract as the staged path).
    * ``cfg.normal_mapping`` — uv joins the raster channels and the bump
      perturbation (ops/bump.bump_planar, tile-block derivatives) runs
      in-kernel on the raw interpolated normals, exactly where the staged
      path applies it.
    * ``cfg.bloom`` — the kernel emits linear HDR (tonemap/gamma skipped) and
      the XLA post chain (bloom -> tonemap -> gamma) finishes outside.

    With return_overflow=True returns (frame, overflow): the number of tiles
    whose binned triangle list exceeded the K cap, plus tiles whose live-light
    count exceeded cfg.max_live_lights_per_tile (an empirical budget — the
    flagship scene measures overflow-free, but a denser scene/viewpoint CAN
    exceed it; the counter is the loud signal, never a silent drop), plus the
    shadow-path counters when cfg.shadows.

    With `band_h`/`y_offset` (the screen-sharded multi-chip path) the whole
    fused pipeline — binning, prepass, culling, shadows, the mono-kernel —
    runs on rows [y_offset, y_offset + band_h) only and returns the band's
    LINEAR HDR [band_h, W, 3] f32 (no tonemap/bloom/FXAA): the cross-band
    post chain belongs to the caller (parallel/sharded._post_band).
    `band_h` must be a multiple of cfg.tile_h so band tile blocks coincide
    with the full-frame grid (checked; required for in-kernel bump parity)."""
    band = band_h is not None
    H = band_h or cfg.height
    FH = cfg.height  # NDC frame height (== H for whole frames)
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    if band and H % TH:
        raise ValueError(
            f"fused band height {H} must be a multiple of tile_h={TH}"
        )
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    tris, view_proj = setup_frame_triangles(state, cfg)
    from .raster_pallas import VMEM_INDIRECTION_SLOTS, rasterize_depth
    from .transform import TRI_VALID

    T = tris.packed.shape[0]
    K = -(-min(cfg.max_tris_per_tile, T) // CHUNK) * CHUNK
    indirect = T <= VMEM_INDIRECTION_SLOTS

    # Per-mesh material table with the G-buffer quantization + sRGB decode
    # BAKED IN (quantize-then-decode of a per-mesh constant commutes with the
    # per-pixel winner select, so this is bit-exact vs the staged per-pixel
    # path) — the kernel selects rows by winning mesh id with a where-chain.
    mats = state.materials
    M = mats.albedo.shape[0]
    alb_q = jnp.round(jnp.clip(mats.albedo, 0.0, 1.0) * 255.0) / 255.0
    alb_lin = jnp.power(jnp.maximum(alb_q, 0.0), cfg.gamma)
    metal_q = jnp.round(jnp.clip(mats.metalness, 0.0, 1.0) * 255.0) / 255.0
    rough_q = jnp.round(jnp.clip(mats.roughness, 0.0, 1.0) * 3.0) / 3.0
    mat_table = jnp.zeros((max(M, 8), 8), jnp.float32)
    mat_table = mat_table.at[:M, 0:3].set(alb_lin)
    mat_table = mat_table.at[:M, 3].set(metal_q)
    mat_table = mat_table.at[:M, 4].set(rough_q)

    valid = tris.packed[:, TRI_VALID] > 0.0
    # The compacted record stream is built ONCE inside binning (a single row
    # gather of the sorted pair prefix); the depth prepass and the main kernel
    # both consume the same segments.
    binned = bin_triangles(
        tris.packed, tris.aabb, valid, cfg, band_h=band_h, y_offset=y_offset,
        stream_src=None if indirect else tris.packed,
    )

    li = state.lights
    L = max(li.num_point, 1)
    light_table = build_light_table(li)

    # Per-tile light lists: depth-only prepass -> EXACT depth-aware culling on
    # the kernel's tile grid.  The list length is cfg.max_live_lights_per_tile
    # (its DMA cost scales with it; exact culling keeps ~1-20 live lights per
    # tile) — exceeding it raises the loud overflow counter, never a silent
    # drop.  The kernel then loops each tile's count, never the full light set.
    NT = nty * ntx
    # In-kernel light culling (cfg flag): the mono-kernel culls + compacts the
    # light set itself from its own rastered depth — the depth prepass (on
    # no-shadow configs), the XLA tile cull, and the per-tile id-list DMA all
    # drop out of the frame.  See the kernel's cull block for the exactness
    # argument; overflow beyond max_live_lights_per_tile stays LOUD via a
    # per-step int32 output summed below.
    ik = bool(cfg.inkernel_light_cull) and li.num_point > 0
    # Deferred-directional split (cfg flag): the kernel skips the directional
    # term and emits depth/normal/mesh-id planes; XLA computes PCF visibility
    # from the KERNEL depth and adds vis * directional after the call.  The
    # prepass then has no consumer left when the in-kernel cull is also on.
    # Band mode keeps the in-kernel vis plane (the cross-band path is pinned
    # by the sharded tests and its post chain runs in the caller).
    split = bool(cfg.deferred_directional) and cfg.shadows and not band
    l_overflow = jnp.zeros((), jnp.int32)
    depth_pre = None
    if (li.num_point and not ik) or (cfg.shadows and not split):
        depth_pre = rasterize_depth(
            tris.packed, tris.aabb, cfg, binned=binned, interpret=interpret,
            band_h=band_h, y_offset=y_offset,
        )
    if li.num_point and not ik:
        tl = cull_lights_to_tiles(
            depth_pre, li, cfg, view_proj, tile=(TH, TW),
            max_per_tile=min(L, cfg.max_live_lights_per_tile),
            y_offset=y_offset, full_height=FH if band else None,
        )
        light_ids = tl.indices.reshape(NT, -1)
        light_counts = tl.counts.reshape(NT)
        l_overflow = tl.overflow
    else:
        light_ids = jnp.zeros((NT, 1), jnp.int32)
        light_counts = jnp.zeros((NT,), jnp.int32)
    light_ids = pad_light_ids_to_chunk(light_ids)
    Lk = light_ids.shape[1]

    ik_slots = 0
    lt_rows = None
    if ik:
        # Compacted-slot budget (CHUNK multiple) + transposed light params for
        # the lane-wise sphere tests.  Lane padding carries radius^2 = -1 so a
        # padded lane can never test live (its id would index out of bounds).
        ik_slots = -(-min(cfg.max_live_lights_per_tile, L) // CHUNK) * CHUNK
        Lp = -(-L // 128) * 128
        lt_rows = jnp.full((4, Lp), -1.0, jnp.float32)
        lt_rows = lt_rows.at[0:3, :L].set(li.point_position.T)
        lt_rows = lt_rows.at[3, :L].set(li.point_radius * li.point_radius)

    # Shadow-visibility plane (multiplies the directional term in-kernel).
    # Computed from the prepass depth — bit-identical to the kernel's own
    # depth plane (pinned invariant), so it matches what the staged path
    # computes from its materialized G-buffer depth.
    vis_pad = None
    sd = lvp = None
    if cfg.shadows:
        from .shadows import render_shadow_map, shadow_visibility

        sd, lvp, s_overflow = render_shadow_map(
            state, cfg, return_overflow=True
        )
        l_overflow = l_overflow + s_overflow
        if not split:
            vis, v_overflow = shadow_visibility(
                depth_pre, view_proj, sd, lvp, cfg, return_overflow=True,
                y_offset=y_offset, full_height=FH if band else None,
            )
            l_overflow = l_overflow + v_overflow
            vis_pad = jnp.pad(
                vis, ((0, Hp - H), (0, Wp - W)), constant_values=1.0
            )

    # Shared zero-guarded normalize — the staged path (lighting.py) uses the
    # same guard, so a degenerate (0,0,0) light direction renders identically
    # on every path instead of NaN-ing only the Mosaic kernels.
    ldir = xmath.normalize_safe(-li.direction)
    uniforms = jnp.zeros((U_SIZE,), jnp.float32)
    uniforms = uniforms.at[U_INV_VP : U_INV_VP + 16].set(
        jnp.linalg.inv(view_proj).reshape(-1)
    )
    uniforms = uniforms.at[U_EYE : U_EYE + 3].set(state.camera.eye)
    uniforms = uniforms.at[U_LDIR : U_LDIR + 3].set(ldir)
    uniforms = uniforms.at[U_LCOLOR : U_LCOLOR + 3].set(li.color)
    uniforms = uniforms.at[U_AMBIENT].set(cfg.ambient)
    uniforms = uniforms.at[U_W].set(float(W))
    uniforms = uniforms.at[U_H].set(float(FH))
    uniforms = uniforms.at[U_TONEMAP].set(1.0 if cfg.tonemap == "reinhard" else 0.0)
    uniforms = uniforms.at[U_Y0].set(jnp.asarray(y_offset, jnp.float32))

    G = 1 if indirect else _pick_group_stream(ntx, K)
    ngx = ntx // G
    max_rows = G * K
    nladder = -(-max_rows // STREAM_COPY_ROWS) * STREAM_COPY_ROWS
    bump = (cfg.bump_strength, cfg.bump_frequency) if cfg.normal_mapping else None
    # The split needs linear HDR out (tonemap must follow the directional add).
    hdr_out = cfg.bloom or band or split
    kernel = functools.partial(
        _fused_kernel, tile_h=TH, tile_w=TW, ntx=ntx, gamma=cfg.gamma,
        indirect=indirect, group=G, n_mats=M, max_rows=max_rows,
        local_clamp=0 if indirect else nladder - K,
        bump=bump, has_vis=vis_pad is not None, hdr_out=hdr_out,
        ik_slots=ik_slots, aux_out=split, db=cfg.stream_dma_db,
    )
    scratch_shapes = []
    prefetch = [binned.counts[:, 0], light_counts, uniforms]
    if indirect:
        K = binned.idx.shape[1]
        tri_specs = [
            pl.BlockSpec((1, K, 1), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                         memory_space=pltpu.VMEM),  # per-tile triangle ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole packed array (VMEM)
        ]
        tri_args = (binned.idx[..., None], tris.packed)
    else:
        assert max_rows <= STREAM_SLACK, "stream slack must cover a group span"
        prefetch.append(binned.offs)  # segment offsets, read as scalars
        tri_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # record stream (HBM)
        tri_args = (binned.stream,)
        dbf = cfg.stream_dma_db
        scratch_shapes = [
            pltpu.VMEM(((2 if dbf else 1) * nladder, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)) if dbf else pltpu.SemaphoreType.DMA,
        ]

    extra_specs = []
    extra_args = []
    if vis_pad is not None:
        extra_specs.append(
            pl.BlockSpec(
                (TH, G * TW), lambda ty, gx, *_: (ty, gx),
                memory_space=pltpu.VMEM,
            )
        )
        extra_args.append(vis_pad)

    # Output channels: HDR rgb, plus the split's aux planes (depth, decoded
    # normal xyz, mesh id) when the XLA side finishes the directional term.
    C = 8 if split else 3
    color_shape = jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32)
    color_spec = pl.BlockSpec(
        (C, TH, G * TW), lambda ty, gx, *_: (0, ty, gx),
        memory_space=pltpu.VMEM,
    )
    if ik:
        # Whole transposed light-param rows instead of per-tile id lists.
        lids_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        lids_arg = lt_rows
        # Compacted-id scratch, written by the in-kernel cull (appended LAST —
        # the kernel strips it from the end of the ref list).
        scratch_shapes = scratch_shapes + [
            pltpu.VMEM((ik_slots, G), jnp.int32)
        ]
        out_shape = (
            color_shape,
            jax.ShapeDtypeStruct((nty, ngx), jnp.int32),  # loud overflow
        )
        out_specs = (
            color_spec,
            # Whole-array SMEM block (constant index map): the buffer stays
            # resident across grid steps and each step writes its own element.
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
    else:
        lids_spec = pl.BlockSpec(                    # per-step light-id lists
            (1, Lk, G), lambda ty, gx, *_, _g=ngx: (ty * _g + gx, 0, 0),
            memory_space=pltpu.VMEM,
        )
        # Light-id lists transposed to [step, Lk, G]: ONE contiguous block DMA
        # per grid step (a [G*Lk, 1] sublane-major layout costs G*Lk separate
        # 4-byte strided row copies), while per-light reads stay dynamic-
        # SUBLANE indexed (Mosaic cannot scalar-load a dynamic lane).
        lids_arg = light_ids.reshape(nty * ngx, G, Lk).transpose(0, 2, 1)
        out_shape = color_shape
        out_specs = color_spec

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(nty, ngx),
        in_specs=tri_specs + [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # light table (whole)
            lids_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # material table (whole)
        ] + extra_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        *prefetch, *tri_args, light_table, lids_arg,
        mat_table, *extra_args,
    )
    if ik:
        out, ik_ovf = out
        l_overflow = l_overflow + jnp.sum(ik_ovf)

    # Channel-first [3, H, W] until the final uint8 transpose — the kernel's
    # native plane layout, so the post chain avoids a round-trip through
    # [H, W, 3].  Transposes commute with the elementwise post chain, so
    # values are bit-identical to the HWC form.  Measured on-chip
    # (tools/ab_config4_parts.py, 2026-08-20): a WASH vs the HWC tail
    # (14.4-14.6 ms config-4 either way, run noise ±0.3) — the standalone HWC
    # bloom's 1.7 ms (tools/ab_bloom.py) is NOT a layout tax; see the bloom
    # notes in BENCH.md.  Kept for the layout clarity, not as a perf claim.
    color_chw = out[0:3, :H, :W]
    if split:
        # ---------------- deferred directional (XLA, post-kernel) ----------
        # PCF visibility from the KERNEL's depth plane (bit-identical to the
        # prepass depth — pinned invariant), then the staged path's
        # directional GGX over the kernel's own emitted G-buffer planes:
        # decoded normal, and materials re-selected by the SAME where-chain /
        # pre-quantized table the kernel shaded with (bit-same values).
        from .lighting import (
            _ggx_brdf,
            _normalize,
            reconstruct_world_positions,
        )
        from .shadows import shadow_visibility

        depth_k = out[3, :H, :W]
        # Lit-facing mask from the kernel's decoded normals: a pixel with
        # NdotL <= 0 has a zero directional term (both diffuse and spec scale
        # by ndl), so its vis is never consumed — sparse PCF prunes tiles
        # with no lit pixel from the gather set (exact at the frame level).
        lit = (
            out[4, :H, :W] * ldir[0]
            + out[5, :H, :W] * ldir[1]
            + out[6, :H, :W] * ldir[2]
        ) > 0.0
        vis, v_overflow = shadow_visibility(
            depth_k, view_proj, sd, lvp, cfg, return_overflow=True,
            lit_mask=lit,
        )
        l_overflow = l_overflow + v_overflow
        if cfg.split_resolve_pallas and (
            jax.default_backend() == "tpu" or interpret
        ):
            # Mosaic resolve: the same math as the XLA block below, per tile
            # row in VMEM — the full-screen XLA pass measured ~1.8 ms at
            # 1080p (the reason the split was a round-3 wash).
            resolved = directional_resolve_pallas(
                out, vis, mat_table, uniforms, cfg, n_mats=M,
                interpret=interpret,
            )
            color_chw = resolved[:, :H, :W]
        else:
            n_k = out[4:7, :H, :W].transpose(1, 2, 0)
            mid_k = out[7, :H, :W]
            zero = jnp.zeros_like(mid_k)
            ar, ag, ab_, met_k, rgh_k = zero, zero, zero, zero, zero
            for m in range(M):
                sel = mid_k == float(m)
                ar = jnp.where(sel, mat_table[m, 0], ar)
                ag = jnp.where(sel, mat_table[m, 1], ag)
                ab_ = jnp.where(sel, mat_table[m, 2], ab_)
                met_k = jnp.where(sel, mat_table[m, 3], met_k)
                rgh_k = jnp.where(sel, mat_table[m, 4], rgh_k)
            alb_k = jnp.stack([ar, ag, ab_], axis=-1)
            world = reconstruct_world_positions(depth_k, view_proj, cfg)
            vvec = _normalize(state.camera.eye - world)
            direct = _ggx_brdf(n_k, vvec, ldir, alb_k, met_k, rgh_k)
            direct = direct * vis[..., None] * li.color
            covered = depth_k < 1.0
            color = color_chw.transpose(1, 2, 0) + jnp.where(
                covered[..., None], direct, 0.0
            )
            color_chw = color.transpose(2, 0, 1)
    if band:
        # Band mode returns linear HDR [band_h, W, 3]; the cross-band post
        # chain (bloom -> tonemap -> gamma -> FXAA) runs in the sharded caller.
        color = color_chw.transpose(1, 2, 0)
        if return_overflow:
            return color, binned.overflow + l_overflow
        return color
    if hdr_out:
        # XLA post on the kernel's linear HDR: bloom -> tonemap -> gamma,
        # identical op order (and values) to post.apply_post, channel-first.
        # (The split forces hdr_out even without bloom — tonemap must follow
        # the directional add — so bloom itself stays gated on cfg.bloom.)
        from . import post

        if cfg.bloom:
            color_chw = post.bloom_chw(
                color_chw, cfg.bloom_threshold, cfg.bloom_strength
            )
        if cfg.tonemap == "reinhard":
            color_chw = post.reinhard(color_chw)
        color_chw = post.gamma_encode(color_chw, cfg.gamma)
    if cfg.fxaa:
        # Same slot as the staged apply_post: on the gamma-encoded float
        # image BEFORE uint8 quantization (FXAA on the quantized frame would
        # diverge from the staged path by the quantization error on edges).
        # FXAA's neighborhood logic is written HWC — transpose here (FXAA
        # configs pay one f32 transpose, exactly what every config paid
        # before the channel-first tail).
        from . import post as _post

        color_chw = _post.fxaa(color_chw.transpose(1, 2, 0)).transpose(2, 0, 1)
    frame = (
        jnp.round(jnp.clip(color_chw, 0.0, 1.0) * 255.0)
        .astype(jnp.uint8)
        .transpose(1, 2, 0)
    )
    if return_overflow:
        return frame, binned.overflow + l_overflow
    return frame

"""Pallas tile-binned rasterizer — the TPU-native geometry pass.

Replaces the D3D12 hardware rasterizer + ROPs with a software design shaped for the
TPU memory hierarchy (SURVEY.md §7 hard parts 1-2):

1. **Binning (XLA)**: each triangle's screen AABB is tested against the tile grid;
   per tile, the overlapping triangle indices are compacted with lax.top_k (which
   preserves submission order among ties — required for D3D's depth-LESS
   "first-equal wins" semantics) and the triangle records are pre-gathered into a
   dense [tiles, K, 32] array.  Gathers/compaction live in XLA where they are cheap;
   the kernel sees only dense, statically-shaped blocks.

2. **Raster kernel (Pallas)**: grid over screen tiles.  Each program holds one
   (TILE_H x TILE_W) pixel block in VMEM plus its [K, 32] binned triangle records,
   and loops over the tile's actual triangle count (a dynamic fori bound read from
   SMEM).  Coverage is 3 edge-function FMAs on the VPU over the whole pixel block;
   the z-buffer race that GPU ROPs resolve in hardware becomes a sequential
   min-select over the loop carry — exact, deterministic, and order-identical to the
   reference rasterizer (raster_ref.py), which the tests assert.

The per-pixel rules (pixel-center sampling, top-left fill, depth clip,
perspective-correct attributes) are shared with raster_ref via the same packed
triangle records from ops/transform.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RendererConfig
from .raster_ref import FragmentPlanes
from .transform import (
    TRI_AREA,
    TRI_MESH_ID,
    TRI_N0,
    TRI_RW0,
    TRI_RW1,
    TRI_RW2,
    TRI_UV0,
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
)

# Output plane indices (leading dim of the [8, H, W] kernel output).
PLANE_DEPTH, PLANE_NX, PLANE_NY, PLANE_NZ = 0, 1, 2, 3
PLANE_U, PLANE_V, PLANE_MID, PLANE_PAD = 4, 5, 6, 7
NUM_PLANES = 8


class BinnedTriangles(NamedTuple):
    idx: jnp.ndarray      # [NT, K] int32 — per-tile triangle ids (submission order)
    counts: jnp.ndarray   # [NT, 1] int32 — triangles binned to each tile (clamped to K)
    overflow: jnp.ndarray  # [] int32 — tiles whose true count exceeded K (dropped tris)
    records: jnp.ndarray | None = None  # [NT, K, TRI_STRIDE] f32, gathered on demand

    def with_records(self, packed: jnp.ndarray) -> "BinnedTriangles":
        return self._replace(records=packed[self.idx])


# bin_triangles switches to the two-level scheme when the flat [tiles, T] overlap
# matrix + per-tile top_k would exceed this many cells — the flat top_k's measured
# device cost scales with NT*T (183 ms at 2025x48k on v5e!) while two-level is
# O(NC*T + NT*K_COARSE) (17 ms on the same scene).
TWO_LEVEL_CELLS = 4_000_000
COARSE_GROUP = (8, 4)   # fine tiles per coarse tile (y, x) -> 64 x 512 px default
K_COARSE = 4096         # candidate cap per coarse tile


def _overlap_matrix(aabb, valid, y0s, x0s, span_h, span_w):
    """[len(y0s) * len(x0s), T] bool: tri AABB vs tile-rect intersection."""
    minx, miny, maxx, maxy = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    ox = (minx[None, :] < x0s[:, None] + span_w) & (maxx[None, :] >= x0s[:, None])
    oy = (miny[None, :] < y0s[:, None] + span_h) & (maxy[None, :] >= y0s[:, None])
    return (oy[:, None, :] & ox[None, :, :] & valid[None, None, :]).reshape(
        y0s.shape[0] * x0s.shape[0], -1
    )


def bin_triangles(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: RendererConfig,
    band_h: int | None = None,
    y_offset=0,
) -> BinnedTriangles:
    """XLA-side binning + compaction + gather (see module docstring).

    Flat path for moderate scenes; two-level (coarse -> fine) for large ones so
    memory stays O(NC*T + NT*K) instead of O(NT*T).

    `band_h`/`y_offset` restrict binning to a horizontal band of the frame
    starting at pixel row y_offset (which may be a traced value — the multi-chip
    screen-sharded path passes axis_index * band)."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    T = packed.shape[0]
    K = min(cfg.max_tris_per_tile, T)
    y_off = jnp.asarray(y_offset, jnp.float32)

    if T * nty * ntx <= TWO_LEVEL_CELLS or T <= 64:
        ty = y_off + jnp.arange(nty, dtype=jnp.float32) * TH
        tx = jnp.arange(ntx, dtype=jnp.float32) * TW
        overlap = _overlap_matrix(aabb, valid, ty, tx, TH, TW)
        # top_k keeps ties in index order => triangles stay in submission order,
        # preserving depth-LESS first-wins semantics.
        _, idx = jax.lax.top_k(overlap.astype(jnp.float32), K)
        true_counts = jnp.sum(overlap, axis=-1)
        counts = jnp.minimum(true_counts, K).astype(jnp.int32)
        overflow = jnp.sum(true_counts > K).astype(jnp.int32)
        return BinnedTriangles(
            idx=idx.astype(jnp.int32), counts=counts[:, None], overflow=overflow
        )

    # ---- Two-level binning ----
    gy, gx = COARSE_GROUP
    ncy, ncx = -(-nty // gy), -(-ntx // gx)
    k1 = min(K_COARSE, T)

    cy0 = y_off + jnp.arange(ncy, dtype=jnp.float32) * (gy * TH)
    cx0 = jnp.arange(ncx, dtype=jnp.float32) * (gx * TW)
    overlap1 = _overlap_matrix(aabb, valid, cy0, cx0, gy * TH, gx * TW)  # [NC, T]
    _, idx1 = jax.lax.top_k(overlap1.astype(jnp.float32), k1)  # [NC, k1] ascending ids
    true_counts1 = jnp.sum(overlap1, axis=-1)
    counts1 = jnp.minimum(true_counts1, k1).astype(jnp.int32)
    overflow = jnp.sum(true_counts1 > k1).astype(jnp.int32)

    cand_aabb = aabb[idx1]          # [NC, k1, 4]
    cand_live = (
        jnp.arange(k1)[None, :] < counts1[:, None]
    )  # [NC, k1] slot validity

    # Fine-tile rects local to each coarse tile.
    NC = ncy * ncx
    cyi = jnp.arange(NC) // ncx  # coarse row
    cxi = jnp.arange(NC) % ncx
    ly = jnp.arange(gy, dtype=jnp.float32) * TH
    lx = jnp.arange(gx, dtype=jnp.float32) * TW
    fy0 = y_off + cyi[:, None].astype(jnp.float32) * (gy * TH) + ly[None, :]  # [NC, gy]
    fx0 = cxi[:, None].astype(jnp.float32) * (gx * TW) + lx[None, :]  # [NC, gx]

    minx, miny, maxx, maxy = (
        cand_aabb[..., 0], cand_aabb[..., 1], cand_aabb[..., 2], cand_aabb[..., 3]
    )  # each [NC, k1]
    oy = (miny[:, None, :] < fy0[..., None] + TH) & (
        maxy[:, None, :] >= fy0[..., None]
    )  # [NC, gy, k1]
    ox = (minx[:, None, :] < fx0[..., None] + TW) & (
        maxx[:, None, :] >= fx0[..., None]
    )  # [NC, gx, k1]
    overlap2 = (
        oy[:, :, None, :] & ox[:, None, :, :] & cand_live[:, None, None, :]
    )  # [NC, gy, gx, k1]

    _, slot = jax.lax.top_k(
        overlap2.reshape(NC * gy * gx, k1).astype(jnp.float32), K
    )  # local slots, ascending -> global order preserved
    true_counts2 = jnp.sum(overlap2, axis=-1).reshape(NC * gy * gx)
    counts2 = jnp.minimum(true_counts2, K).astype(jnp.int32)
    overflow = overflow + jnp.sum(true_counts2 > K).astype(jnp.int32)

    idx1_b = jnp.broadcast_to(idx1[:, None, :], (NC, gy * gx, k1)).reshape(
        NC * gy * gx, k1
    )
    idx2 = jnp.take_along_axis(idx1_b, slot, axis=1)  # [NC*gy*gx, K] global tri ids

    # Rearrange (cy, cx, ly, lx) -> global fine tile (fy, fx), crop padding.
    idx2 = idx2.reshape(ncy, ncx, gy, gx, K).transpose(0, 2, 1, 3, 4)
    idx2 = idx2.reshape(ncy * gy, ncx * gx, K)[:nty, :ntx].reshape(nty * ntx, K)
    counts2 = counts2.reshape(ncy, ncx, gy, gx).transpose(0, 2, 1, 3)
    counts2 = counts2.reshape(ncy * gy, ncx * gx)[:nty, :ntx].reshape(nty * ntx)

    return BinnedTriangles(
        idx=idx2.astype(jnp.int32), counts=counts2[:, None], overflow=overflow
    )


def _raster_tile(fetch_tri, n, yoff, out_ref, *, tile_h, tile_w):
    """Shared tile rasterization: loop `n` binned triangles (rows produced by
    `fetch_tri(k)`), keep the min-depth winner per pixel, write the planes."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    y0 = (yoff + ty * tile_h).astype(jnp.float32)
    x0 = (tx * tile_w).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    py = y0 + 0.5 + iy
    px = x0 + 0.5 + ix

    def body(k, carry):
        depth, nx, ny, nz, uu, vv, mid = carry
        t = fetch_tri(k)  # [TRI_STRIDE]

        x0v, y0v = t[TRI_X0], t[TRI_Y0]
        x1v, y1v = t[TRI_X1], t[TRI_Y1]
        x2v, y2v = t[TRI_X2], t[TRI_Y2]

        def edge(ax, ay, bx, by):
            # e(p) = cross2d(b - a, p - a); top-left tie bias (see raster_ref).
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
        passes = (
            covered & (t[TRI_VALID] > 0.0) & (z < depth) & (z >= 0.0) & (z <= 1.0)
        )

        rw = b0 * t[TRI_RW0] + b1 * t[TRI_RW1] + b2 * t[TRI_RW2]
        inv_rw = 1.0 / jnp.where(rw == 0.0, 1.0, rw)

        def interp3(o):
            return (
                b0 * t[o] + b1 * t[o + 3] + b2 * t[o + 6]
            ) * inv_rw

        def interp2(o):
            return (
                b0 * t[o] + b1 * t[o + 2] + b2 * t[o + 4]
            ) * inv_rw

        new = (
            jnp.where(passes, z, depth),
            jnp.where(passes, interp3(TRI_N0), nx),
            jnp.where(passes, interp3(TRI_N0 + 1), ny),
            jnp.where(passes, interp3(TRI_N0 + 2), nz),
            jnp.where(passes, interp2(TRI_UV0), uu),
            jnp.where(passes, interp2(TRI_UV0 + 1), vv),
            jnp.where(passes, t[TRI_MESH_ID], mid),
        )
        return new

    shape = (tile_h, tile_w)
    init = (
        jnp.ones(shape, jnp.float32),          # depth cleared to 1.0
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.full(shape, -1.0, jnp.float32),    # mesh id as float, -1 = background
    )
    depth, nx, ny, nz, uu, vv, mid = jax.lax.fori_loop(0, n, body, init)

    out_ref[PLANE_DEPTH] = depth
    out_ref[PLANE_NX] = nx
    out_ref[PLANE_NY] = ny
    out_ref[PLANE_NZ] = nz
    out_ref[PLANE_U] = uu
    out_ref[PLANE_V] = vv
    out_ref[PLANE_MID] = mid
    out_ref[PLANE_PAD] = jnp.zeros(shape, jnp.float32)


def _raster_kernel(counts_ref, yoff_ref, tris_ref, out_ref, *, tile_h, tile_w, ntx):
    """Gathered-records variant: each tile streams its pre-gathered [K, 32] block."""
    tile = pl.program_id(0) * ntx + pl.program_id(1)
    _raster_tile(
        lambda k: tris_ref[0, k, :], counts_ref[tile], yoff_ref[0], out_ref,
        tile_h=tile_h, tile_w=tile_w,
    )


def _raster_kernel_indirect(
    counts_ref, yoff_ref, idx_ref, packed_ref, out_ref, *, tile_h, tile_w, ntx
):
    """Indirect variant: the whole packed triangle array stays resident in VMEM and
    tiles fetch rows by id — no per-tile record gather traffic.  Used when the
    packed array fits the VMEM budget (small/medium scenes)."""
    tile = pl.program_id(0) * ntx + pl.program_id(1)

    def fetch(k):
        tid = idx_ref[0, k, 0]
        return packed_ref[tid, :]

    _raster_tile(
        fetch, counts_ref[tile], yoff_ref[0], out_ref,
        tile_h=tile_h, tile_w=tile_w,
    )


# Packed arrays at most this many slots keep the whole triangle buffer resident in
# VMEM.  NOTE the VMEM cost is slots * 128 lanes * 4 bytes — the (8, 128) tile
# layout pads the 32-lane records to 128 — so 8k slots is ~4.2 MB of the ~16 MB
# budget.  Larger scenes stream pre-gathered per-tile records instead (measured
# equal step time; the indirect path only saves HBM gather traffic).
VMEM_INDIRECTION_SLOTS = 8192


def rasterize_binned(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    cfg: RendererConfig,
    interpret: bool = False,
    band_h: int | None = None,
    y_offset=0,
) -> FragmentPlanes:
    """Tile-binned Pallas rasterization -> FragmentPlanes (same contract as
    raster_ref.rasterize_packed).

    With `band_h`/`y_offset`, rasterizes only rows [y_offset, y_offset + band_h)
    of the full frame (y_offset may be traced) — the screen-sharded multi-chip
    path runs this per band."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    valid = packed[:, TRI_VALID] > 0.0
    binned = bin_triangles(packed, aabb, valid, cfg, band_h=band_h, y_offset=y_offset)
    K = binned.idx.shape[1]
    T = packed.shape[0]
    yoff = jnp.asarray(y_offset, jnp.int32).reshape(1)

    out_specs = pl.BlockSpec(
        (NUM_PLANES, TH, TW), lambda ty, tx, *_: (0, ty, tx),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((NUM_PLANES, Hp, Wp), jnp.float32)

    if T <= VMEM_INDIRECTION_SLOTS:
        kernel = functools.partial(
            _raster_kernel_indirect, tile_h=TH, tile_w=TW, ntx=ntx
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(
                    (1, K, 1), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # whole packed array
            ],
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.idx[..., None], packed)
    else:
        kernel = functools.partial(_raster_kernel, tile_h=TH, tile_w=TW, ntx=ntx)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(
                    (1, K, TRI_STRIDE),
                    lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.with_records(packed).records)

    out = out[:, :H, :W]
    return FragmentPlanes(
        depth=out[PLANE_DEPTH],
        normal=jnp.stack([out[PLANE_NX], out[PLANE_NY], out[PLANE_NZ]], axis=-1),
        uv=jnp.stack([out[PLANE_U], out[PLANE_V]], axis=-1),
        mesh_id=out[PLANE_MID].astype(jnp.int32),
    )

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


# bin_triangles uses the flat [tiles, T] overlap matrix + per-tile top_k only for
# small scenes (the top_k's measured device cost scales with NT*T: 183 ms at
# 2025x48k on v5e).  Above FLAT_CELLS it switches to sort-based binning: emit
# (tile, triangle) pairs, one lexicographic device sort groups them per tile in
# submission order (a raw 3M-key sort measures ~4 ms on the same chip).
FLAT_CELLS = 1_000_000


def _overlap_matrix(aabb, valid, y0s, x0s, span_h, span_w):
    """[len(y0s) * len(x0s), T] bool: tri AABB vs tile-rect intersection."""
    minx, miny, maxx, maxy = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    ox = (minx[None, :] < x0s[:, None] + span_w) & (maxx[None, :] >= x0s[:, None])
    oy = (miny[None, :] < y0s[:, None] + span_h) & (maxy[None, :] >= y0s[:, None])
    return (oy[:, None, :] & ox[None, :, :] & valid[None, None, :]).reshape(
        y0s.shape[0] * x0s.shape[0], -1
    )


def bin_triangles_flat(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: RendererConfig,
    band_h: int | None = None,
    y_offset=0,
) -> BinnedTriangles:
    """O(NT*T) overlap-matrix binning — fast for small scenes, and the semantics
    oracle the sort-based path is tested against."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    T = packed.shape[0]
    K = min(cfg.max_tris_per_tile, T)
    y_off = jnp.asarray(y_offset, jnp.float32)

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


def bin_triangles(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: RendererConfig,
    band_h: int | None = None,
    y_offset=0,
) -> BinnedTriangles:
    """XLA-side binning + compaction + gather (see module docstring).

    Flat overlap-matrix path for small scenes; sort-based (tile, triangle)-pair
    binning for large ones.  The sort path:

      1. Each triangle's AABB maps to a tile-index rectangle.  Triangles covering
         at most ``cfg.bin_expand`` tiles emit that many (tile, tri) pairs from a
         static [T, E] expansion; larger ("big") triangles — up to
         ``cfg.bin_max_big`` of them — emit one pair per overlapped tile from a
         [B, NT] expansion.  Unused slots emit the sentinel tile NT.
      2. One lexicographic sort by (tile, tri) groups pairs per tile with
         triangles in submission order — the exact order-preservation property
         the flat path gets from top_k tie behavior (depth-LESS first-wins).
      3. searchsorted yields per-tile segment offsets; a dense [NT, K] gather
         produces the same layout the kernels already consume.

    Overflow counts tiles whose triangle list exceeded K, plus any big triangles
    beyond the bin_max_big budget (each would silently drop coverage).

    `band_h`/`y_offset` restrict binning to a horizontal band of the frame
    starting at pixel row y_offset (which may be a traced value — the multi-chip
    screen-sharded path passes axis_index * band)."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    NT = nty * ntx
    T = packed.shape[0]
    K = min(cfg.max_tris_per_tile, T)

    if T * NT <= FLAT_CELLS:
        return bin_triangles_flat(packed, aabb, valid, cfg, band_h, y_offset)

    E = max(1, cfg.bin_expand)
    B = min(cfg.bin_max_big, T)
    y_off = jnp.asarray(y_offset, jnp.float32)

    # Tile-index rectangle per triangle.  The flat path's overlap condition
    # (minx < x0+TW) & (maxx >= x0) is exactly tx in [floor(minx/TW),
    # floor(maxx/TW)] — identical binning criterion.
    minx, miny, maxx, maxy = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    tx0 = jnp.floor(minx / TW).astype(jnp.int32)
    tx1 = jnp.floor(maxx / TW).astype(jnp.int32)
    ty0 = jnp.floor((miny - y_off) / TH).astype(jnp.int32)
    ty1 = jnp.floor((maxy - y_off) / TH).astype(jnp.int32)
    live = valid & (tx1 >= 0) & (tx0 < ntx) & (ty1 >= 0) & (ty0 < nty)
    tx0 = jnp.clip(tx0, 0, ntx - 1)
    tx1 = jnp.clip(tx1, 0, ntx - 1)
    ty0 = jnp.clip(ty0, 0, nty - 1)
    ty1 = jnp.clip(ty1, 0, nty - 1)
    w = tx1 - tx0 + 1
    h = ty1 - ty0 + 1
    footprint = w * h

    small = live & (footprint <= E)
    big = live & (footprint > E)

    # Small triangles: slot e enumerates the w x h tile rect row-major.
    e = jnp.arange(E, dtype=jnp.int32)
    dy = e[None, :] // w[:, None]
    dx = e[None, :] % w[:, None]
    tile_s = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)  # [T, E]
    slot_ok = small[:, None] & (e[None, :] < footprint[:, None])
    tile_s = jnp.where(slot_ok, tile_s, NT)
    tri_s = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, E)
    )

    # Big triangles: compact up to B of them (top_k keeps lowest ids on ties),
    # each emits one pair per tile of the full grid it overlaps.
    n_big = jnp.sum(big).astype(jnp.int32)
    _, big_idx = jax.lax.top_k(big.astype(jnp.float32), B)
    big_idx = big_idx.astype(jnp.int32)
    big_ok = big[big_idx]  # [B] slot validity (padding slots re-select small ids)
    tyi = jnp.arange(nty, dtype=jnp.int32)[None, :, None]
    txi = jnp.arange(ntx, dtype=jnp.int32)[None, None, :]
    ov = (
        (tyi >= ty0[big_idx][:, None, None])
        & (tyi <= ty1[big_idx][:, None, None])
        & (txi >= tx0[big_idx][:, None, None])
        & (txi <= tx1[big_idx][:, None, None])
        & big_ok[:, None, None]
    )  # [B, nty, ntx]
    tile_b = jnp.where(ov, tyi * ntx + txi, NT).reshape(B, NT)
    tri_b = jnp.broadcast_to(big_idx[:, None], (B, NT))

    tiles = jnp.concatenate([tile_s.reshape(-1), tile_b.reshape(-1)])
    tris = jnp.concatenate([tri_s.reshape(-1), tri_b.reshape(-1)])
    P = tiles.shape[0]
    tiles_sorted, tris_sorted = jax.lax.sort((tiles, tris), num_keys=2)

    # Per-tile segments: sentinel pairs (tile == NT) sort past every real tile.
    bounds = jnp.searchsorted(
        tiles_sorted, jnp.arange(NT + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    true_counts = bounds[1:] - bounds[:-1]
    counts = jnp.minimum(true_counts, K).astype(jnp.int32)
    overflow = (
        jnp.sum(true_counts > K) + jnp.maximum(n_big - B, 0)
    ).astype(jnp.int32)

    gidx = jnp.clip(bounds[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :], 0, P - 1)
    idx = tris_sorted[gidx]  # [NT, K]; slots beyond counts are padding
    return BinnedTriangles(idx=idx, counts=counts[:, None], overflow=overflow)


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


def _depth_tile(fetch_tri, n, yoff, out_ref, *, tile_h, tile_w):
    """Depth-only tile rasterization: the z-test loop of _raster_tile without
    attribute interpolation — used for the light-culling depth prepass and the
    shadow-map pass (both consume depth alone)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    y0 = (yoff + ty * tile_h).astype(jnp.float32)
    x0 = (tx * tile_w).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    py = y0 + 0.5 + iy
    px = x0 + 0.5 + ix

    def body(k, depth):
        t = fetch_tri(k)

        x0v, y0v = t[TRI_X0], t[TRI_Y0]
        x1v, y1v = t[TRI_X1], t[TRI_Y1]
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

        # Same op order as _raster_tile (b first, then the dot) so the depth
        # plane is BIT-identical to the full rasterizer's.
        inv_area = 1.0 / t[TRI_AREA]
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = e2 * inv_area
        z = b0 * t[TRI_Z0] + b1 * t[TRI_Z1] + b2 * t[TRI_Z2]
        passes = (
            covered & (t[TRI_VALID] > 0.0) & (z < depth) & (z >= 0.0) & (z <= 1.0)
        )
        return jnp.where(passes, z, depth)

    depth = jax.lax.fori_loop(0, n, body, jnp.ones((tile_h, tile_w), jnp.float32))
    out_ref[:, :] = depth


def _depth_kernel(counts_ref, yoff_ref, tris_ref, out_ref, *, tile_h, tile_w, ntx):
    tile = pl.program_id(0) * ntx + pl.program_id(1)
    _depth_tile(
        lambda k: tris_ref[0, k, :], counts_ref[tile], yoff_ref[0], out_ref,
        tile_h=tile_h, tile_w=tile_w,
    )


def _depth_kernel_indirect(
    counts_ref, yoff_ref, idx_ref, packed_ref, out_ref, *, tile_h, tile_w, ntx
):
    tile = pl.program_id(0) * ntx + pl.program_id(1)

    def fetch(k):
        tid = idx_ref[0, k, 0]
        return packed_ref[tid, :]

    _depth_tile(
        fetch, counts_ref[tile], yoff_ref[0], out_ref,
        tile_h=tile_h, tile_w=tile_w,
    )


def rasterize_depth(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    cfg: RendererConfig,
    binned: BinnedTriangles | None = None,
    interpret: bool = False,
    band_h: int | None = None,
    y_offset=0,
    height: int | None = None,
    width: int | None = None,
) -> jnp.ndarray:
    """Depth-only tile-binned rasterization -> depth [H, W] float32 (cleared 1.0).

    Exactly the depth plane rasterize_binned would produce, at ~the z-test cost
    alone.  Used as the light-culling prepass (exact tile depth bounds for
    cull_lights_to_tiles) and for shadow maps.  Pass `binned` to reuse an
    existing binning; `height`/`width` override the cfg framebuffer size (shadow
    maps are square and independent of the display resolution)."""
    H = height or band_h or cfg.height
    W = width or cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    if binned is None:
        valid = packed[:, TRI_VALID] > 0.0
        binned = bin_triangles(
            packed, aabb, valid, cfg, band_h=band_h or H, y_offset=y_offset
        )
    K = binned.idx.shape[1]
    T = packed.shape[0]
    yoff = jnp.asarray(y_offset, jnp.int32).reshape(1)

    out_specs = pl.BlockSpec(
        (TH, TW), lambda ty, tx, *_: (ty, tx), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)

    if T <= VMEM_INDIRECTION_SLOTS:
        kernel = functools.partial(
            _depth_kernel_indirect, tile_h=TH, tile_w=TW, ntx=ntx
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nty, ntx),
            in_specs=[
                pl.BlockSpec(
                    (1, K, 1), lambda ty, tx, *_: (ty * ntx + tx, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.idx[..., None], packed)
    else:
        kernel = functools.partial(_depth_kernel, tile_h=TH, tile_w=TW, ntx=ntx)
        records = binned.records
        if records is None:
            records = binned.with_records(packed).records
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
        )(binned.counts[:, 0], yoff, records)

    return out[:H, :W]


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

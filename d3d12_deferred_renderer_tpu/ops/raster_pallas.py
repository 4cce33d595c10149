"""Pallas tile-binned rasterizer — the TPU-native geometry pass.

Replaces the D3D12 hardware rasterizer + ROPs with a software design shaped for
the TPU memory hierarchy (SURVEY.md §7 hard parts 1-2):

1. **Binning (XLA)**: one record sort by (footprint tier, submission index)
   compacts live triangles into per-tier prefixes (dead records — backface
   culled, offscreen, unused near-clip slots — sort past every tier); each
   tier's budget-sized slice expands its tile rect into (tile, triangle) sort
   keys (small/medium/large rects + full-grid big, thresholds area-scaled),
   packed into one int32 key and sorted — key order is (tile, submission)
   order, D3D's depth-LESS "first-equal wins" requirement.  The sorted pair
   prefix IS the output: one row gather builds a compacted RECORD STREAM whose
   per-tile segments sit back-to-back (no dense [tiles, K] layout — ~97%
   padding at realistic occupancy).  Small scenes use the O(tiles*T)
   overlap-matrix + top_k path, which doubles as the tested oracle for the
   sort path.

2. **Raster kernels (Pallas)**: grid over tile ROWS (a VMEM-budgeted group of
   adjacent tiles per step).  Each step manually DMAs its contiguous stream
   span into scratch (fixed-size copy ladder), then rasterizes per sub-tile
   with triangles CHUNK-at-a-time as VPU sublanes against the tile's pixels
   flat in lanes (_chunk_raster): every per-triangle coefficient is a
   (CHUNK, 1) lane slice — zero scalar VMEM extracts.  The z-buffer race that
   GPU ROPs resolve in hardware becomes an exact per-chunk winner resolution
   (masked sublane min, first-slot tie-break, one-hot select with a -0.0
   fill), bit-identical in interpret mode to the reference rasterizer
   (raster_ref.py), which the tests assert.

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


def _pad_lanes(packed: jnp.ndarray) -> jnp.ndarray:
    """Pad record rows to exactly 128 floats (one full lane tile) so VMEM
    blocks built from them are contiguous linear DMAs (a stride<128 row pads
    per-row in VMEM, degenerating the DMA to per-row strided copies)."""
    S = packed.shape[-1]
    lanes = -(-S // 128) * 128
    if lanes != S:
        packed = jnp.pad(packed, ((0, 0), (0, lanes - S)))
    return packed


class BinnedTriangles(NamedTuple):
    idx: jnp.ndarray      # [NT, K] int32 per-tile triangle ids, or None (stream-only)
    counts: jnp.ndarray   # [NT, 1] int32 — triangles binned to each tile (clamped to K)
    overflow: jnp.ndarray  # [] int32 — tiles whose true count exceeded K (dropped tris)
    # Compacted record stream: per-tile segments laid out back-to-back (in the
    # sort path, row i IS sorted pair i — zero re-layout) — the kernels DMA
    # exactly each grid step's segment span instead of a dense (tiles x K)
    # block that is ~97% padding.
    stream: jnp.ndarray | None = None   # [cap + slack, 128] f32
    offs: jnp.ndarray | None = None     # [NT + 1] int32 segment offsets

    def with_stream(
        self, packed: jnp.ndarray, cap: int, slack: int
    ) -> "BinnedTriangles":
        """Build the compacted record stream from the dense idx (fallback for
        the flat binning path — the sort path builds the stream directly from
        its sorted pair list with a single row gather; see bin_triangles).

        `cap` bounds the total (exceeding it clamps tail tiles' counts and
        raises `overflow` — loud, never silent).  `slack` extra garbage rows
        let the kernel's fixed-size copy ladder read past the end safely."""
        NT, K = self.idx.shape
        counts = self.counts[:, 0]
        offs_raw = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
        )
        offs = jnp.minimum(offs_raw, cap)
        scounts = jnp.minimum(counts, offs[1:] - offs[:-1])

        # Row j of the stream belongs to the LAST tile whose segment starts at
        # or before j: t[j] = |{t' : offs[t'] <= j}| - 1.  (searchsorted lowers
        # to a per-element binary-search loop on TPU — ~10 ms at 65k rows; the
        # fused [cap, NT] comparison-sum is a pure VPU contraction.)
        j = jnp.arange(cap, dtype=jnp.int32)
        t = jnp.sum((j[:, None] >= offs[None, :-1]).astype(jnp.int32), axis=1) - 1
        t = jnp.clip(t, 0, NT - 1)
        local = j - offs[t]
        live = local < scounts[t]
        flat = t * K + jnp.minimum(local, K - 1)
        src = jnp.where(live, self.idx.reshape(-1)[flat], 0)
        stream = _pad_lanes(packed[src])
        stream = jnp.pad(stream, ((0, slack), (0, 0)))
        overflow = self.overflow + (offs_raw[NT] > cap).astype(jnp.int32)
        return self._replace(
            stream=stream, offs=offs, counts=scounts[:, None], overflow=overflow
        )


# bin_triangles uses the flat [tiles, T] overlap matrix + per-tile top_k only for
# small scenes (the top_k's measured device cost scales with NT*T: 183 ms at
# 2025x48k on v5e).  Above FLAT_CELLS it switches to sort-based binning: emit
# (tile, triangle) pairs, one lexicographic device sort groups them per tile in
# submission order (a raw 3M-key sort measures ~4 ms on the same chip).
FLAT_CELLS = 1_000_000

# Triangles are rasterized CHUNK at a time as VPU sublanes (see _chunk_raster).
CHUNK = 16


def _pad_slots(idx: jnp.ndarray, K: int) -> jnp.ndarray:
    """Pad the per-tile slot axis to a CHUNK multiple so the kernels can always
    load full (CHUNK, stride) record blocks; padding slots point at triangle 0
    and are masked off by the slot<count test."""
    K8 = -(-K // CHUNK) * CHUNK
    if K8 == K:
        return idx
    return jnp.pad(idx, ((0, 0), (0, K8 - K)))


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
    idx = _pad_slots(idx.astype(jnp.int32), K)
    true_counts = jnp.sum(overlap, axis=-1)
    counts = jnp.minimum(true_counts, K).astype(jnp.int32)
    overflow = jnp.sum(true_counts > K).astype(jnp.int32)
    return BinnedTriangles(idx=idx, counts=counts[:, None], overflow=overflow)


def bin_triangles(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: RendererConfig,
    band_h: int | None = None,
    y_offset=0,
    stream_src: jnp.ndarray | None = None,
) -> BinnedTriangles:
    """XLA-side binning + compaction + gather (see module docstring).

    Flat overlap-matrix path for small scenes; sort-based (tile, triangle)-pair
    binning for large ones.  The sort path:

      1. Each triangle's AABB maps to a tile-index rectangle.  ONE record sort
         by (footprint tier, submission index) compacts the live triangles of
         every tier into contiguous prefixes, with the rect geometry riding
         the sort as a bit-packed payload operand.  Triangles covering at most
         ``cfg.bin_expand`` tiles emit from a [bin_max_small, E] compacted
         expansion (-1 = every record); wider footprints route through two
         further compacted rect tiers (``bin_expand_medium``/``bin_max_medium``
         then ``bin_expand_large``/``bin_max_large``); the widest ("big")
         triangles — up to ``cfg.bin_max_big`` of them — emit one pair per
         overlapped tile from a [B, NT] expansion (skipped entirely when the
         large tier's rect already covers the grid).  Unused slots emit the
         sentinel tile NT.
      2. One lexicographic sort by (tile, tri) groups pairs per tile with
         triangles in submission order — the exact order-preservation property
         the flat path gets from top_k tie behavior (depth-LESS first-wins).
      3. searchsorted yields per-tile segment offsets; the output is either the
         dense [NT, K] id layout, or — with `stream_src` — the compacted record
         STREAM: one row gather of `stream_src` rows by the sorted pair prefix
         (row i of the stream is sorted pair i, segment offsets = the bounds),
         skipping the dense 2*NT*K-element id gather entirely.

    Overflow counts tiles whose triangle list exceeded K, plus any big triangles
    beyond the bin_max_big budget (each would silently drop coverage), plus a
    stream-capacity excess when `stream_src` is used.

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
        binned = bin_triangles_flat(packed, aabb, valid, cfg, band_h, y_offset)
        if stream_src is not None:
            binned = binned.with_stream(
                stream_src, cfg.bin_stream_cap, STREAM_SLACK
            )
        return binned

    # Tier budgets scale with the FULL framebuffer area (base: 1080p): at 4K a
    # triangle's tile footprint quadruples, so the same scene needs wider
    # rects and deeper compaction budgets — without this, resolution changes
    # silently shift work into the overflow counters (loud, but a footgun).
    # Band mode scales by the full-frame area too, NOT the band's: a
    # triangle's horizontal tile span is never band-clipped, so per-band
    # footprints approach the single-chip ones and a band-area scale would
    # under-budget the tiers on sharded high-resolution renders.
    area_scale = max(1, round((cfg.height * W) / (1920 * 1080)))
    E = max(1, cfg.bin_expand * area_scale)
    EM = max(E + 1, cfg.bin_expand_medium * area_scale)
    MB = min(cfg.bin_max_medium * area_scale, T)
    EL = max(EM + 1, cfg.bin_expand_large * area_scale)
    ML = min(cfg.bin_max_large * area_scale, T)
    B = min(cfg.bin_max_big * area_scale, T)
    # When the large tier's rect already covers the whole grid, no footprint
    # can exceed it — the grid-wide big tier would emit only sentinels, so
    # skip its [B, NT] expansion entirely (a static-shape decision).
    has_big = EL < NT
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

    # The small-tier budget scales with area like MB/ML/B: its threshold E
    # scales, so at 4K triangles measured in the 1080p fp 3..8 bucket land in
    # the scaled small tier (E=8) — a count-invariant budget would silently
    # thin the tuned margin before the loud overflow.
    LS = T if cfg.bin_max_small < 0 else min(cfg.bin_max_small * area_scale, T)

    small = live & (footprint <= E)
    medium = live & (footprint > E) & (footprint <= EM)
    if has_big:
        large = live & (footprint > EM) & (footprint <= EL)
        big = live & (footprint > EL)
    else:
        large = live & (footprint > EM)
        big = jnp.zeros_like(live)

    # --- Compacted tiers via ONE stage-1 sort (replaces per-tier top_k) ---
    # Records sort by (tier, submission index): the sorted prefix holds each
    # tier's triangles back-to-back in ascending id order — exactly the set +
    # order top_k(tier_mask) produced, for every tier at once, including the
    # SMALL tier (whose dense [T, E] expansion was ~75% dead records on the
    # benchmark scene: backface-culled + unused near-clip slots emitted 150k
    # sentinel sort keys).  The rect geometry rides the sort as one bit-packed
    # payload operand, so no post-sort gathers are needed.
    tier = jnp.where(
        small, 0,
        jnp.where(medium, 1, jnp.where(large, 2, jnp.where(big, 3, 4))),
    ).astype(jnp.int32)
    n_small = jnp.sum(small).astype(jnp.int32)
    n_med = jnp.sum(medium).astype(jnp.int32)
    n_lrg = jnp.sum(large).astype(jnp.int32)
    n_big = jnp.sum(big).astype(jnp.int32)

    key1 = tier * T + jnp.arange(T, dtype=jnp.int32)
    bw = max((ntx - 1).bit_length(), 1)
    bh = max((nty - 1).bit_length(), 1)
    packed_bits = 2 * (bw + bh)
    if packed_bits <= 30:
        pay = (
            (((w - 1) << (bh + bh + bw)) | ((h - 1) << (bh + bw)))
            | (ty0 << bw)
            | tx0
        ).astype(jnp.int32)
        key1_s, pay_s = jax.lax.sort((key1, pay), num_keys=1)
    else:  # absurdly large tile grids: carry the raw rect columns instead
        key1_s, w_s4, h_s4, ty0_s4, tx0_s4 = jax.lax.sort(
            (key1, w, h, ty0, tx0), num_keys=1
        )
        pay_s = None
    tier_sorted = key1_s // T
    idx_sorted = key1_s - tier_sorted * T

    def tier_slice(start, L):
        """Compacted (ids, w, h, ty0, tx0, tier) for one tier's L-slot budget.
        `start` is traced; dynamic_slice clamps it to T - L, and the tier mask
        (checked against the sliced tier codes) keeps clamp-shifted slots from
        leaking neighbouring tiers' records."""
        ids = jax.lax.dynamic_slice_in_dim(idx_sorted, start, L)
        ts = jax.lax.dynamic_slice_in_dim(tier_sorted, start, L)
        if pay_s is not None:
            p = jax.lax.dynamic_slice_in_dim(pay_s, start, L)
            w_ = (p >> (bh + bh + bw)) + 1
            h_ = ((p >> (bh + bw)) & ((1 << bh) - 1)) + 1
            ty0_ = (p >> bw) & ((1 << bh) - 1)
            tx0_ = p & ((1 << bw) - 1)
        else:
            w_ = jax.lax.dynamic_slice_in_dim(w_s4, start, L)
            h_ = jax.lax.dynamic_slice_in_dim(h_s4, start, L)
            ty0_ = jax.lax.dynamic_slice_in_dim(ty0_s4, start, L)
            tx0_ = jax.lax.dynamic_slice_in_dim(tx0_s4, start, L)
        return ids, w_, h_, ty0_, tx0_, ts

    def rect_slots(e, w_, ty0_, tx0_, fp_, ok_):
        """Slot e of a triangle's w x h tile rect, row-major; sentinel NT when
        the slot is past the footprint or the triangle is not in this tier."""
        dy = e[None, :] // w_[:, None]
        dx = e[None, :] % w_[:, None]
        tile = (ty0_[:, None] + dy) * ntx + (tx0_[:, None] + dx)
        ok = ok_[:, None] & (e[None, :] < fp_[:, None])
        return jnp.where(ok, tile, NT)

    def expand_rect(start, L, Ek, code):
        ids, w_, h_, ty0_, tx0_, ts = tier_slice(start, L)
        e = jnp.arange(Ek, dtype=jnp.int32)
        tile = rect_slots(e, w_, ty0_, tx0_, w_ * h_, ts == code)
        tri = jnp.broadcast_to(ids[:, None], (L, Ek))
        return tile.reshape(-1), tri.reshape(-1)

    tile_s, tri_s = expand_rect(jnp.int32(0), LS, E, 0)
    tile_m, tri_m = expand_rect(n_small, MB, EM, 1)
    tile_l, tri_l = expand_rect(n_small + n_med, ML, EL, 2)

    tile_parts = [tile_s, tile_m, tile_l]
    tri_parts = [tri_s, tri_m, tri_l]

    # Big triangles: each emits one pair per overlapped tile of the full grid.
    if has_big:
        bids, bw_, bh_, bty0, btx0, bts = tier_slice(
            n_small + n_med + n_lrg, B
        )
        big_ok = bts == 3
        tyi = jnp.arange(nty, dtype=jnp.int32)[None, :, None]
        txi = jnp.arange(ntx, dtype=jnp.int32)[None, None, :]
        ov = (
            (tyi >= bty0[:, None, None])
            & (tyi <= (bty0 + bh_ - 1)[:, None, None])
            & (txi >= btx0[:, None, None])
            & (txi <= (btx0 + bw_ - 1)[:, None, None])
            & big_ok[:, None, None]
        )  # [B, nty, ntx]
        tile_parts.append(jnp.where(ov, tyi * ntx + txi, NT).reshape(-1))
        tri_parts.append(jnp.broadcast_to(bids[:, None], (B, NT)).reshape(-1))

    tiles = jnp.concatenate(tile_parts)
    tris = jnp.concatenate(tri_parts)
    P = tiles.shape[0]

    # Sort by (tile, tri).  When the packed key tile*T2 + tri fits int32, ONE
    # single-key sort replaces the 2-key lexicographic sort (~2x cheaper);
    # (tile, tri) pairs are unique so key order == pair order exactly.
    T2 = 1 << max(T - 1, 1).bit_length()
    if (NT + 1) * T2 < 2**31:
        keys = tiles * T2 + tris
        (keys_sorted,) = jax.lax.sort((keys,), num_keys=1)
        tris_sorted = keys_sorted & (T2 - 1)
        bounds = jnp.searchsorted(
            keys_sorted, jnp.arange(NT + 1, dtype=jnp.int32) * T2, side="left"
        ).astype(jnp.int32)
    else:
        tiles_sorted, tris_sorted = jax.lax.sort((tiles, tris), num_keys=2)
        # Per-tile segments: sentinel pairs (tile == NT) sort past every tile.
        bounds = jnp.searchsorted(
            tiles_sorted, jnp.arange(NT + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    true_counts = bounds[1:] - bounds[:-1]
    counts = jnp.minimum(true_counts, K).astype(jnp.int32)
    overflow = (
        jnp.sum(true_counts > K)
        + jnp.maximum(n_small - LS, 0)
        + jnp.maximum(n_med - MB, 0)
        + jnp.maximum(n_lrg - ML, 0)
        + (jnp.maximum(n_big - B, 0) if has_big else 0)
    ).astype(jnp.int32)

    if stream_src is not None:
        # The sorted pair prefix IS the stream: row i holds sorted pair i's
        # record, per-tile segments are [bounds[t], bounds[t+1]).  One row
        # gather builds it; no dense id layout needed at all.  The cap scales
        # with the framebuffer area like the tier budgets above.
        cap = min(cfg.bin_stream_cap * area_scale, P)
        offs = jnp.minimum(bounds, cap)
        scounts = jnp.minimum(counts, offs[1:] - offs[:-1])
        # Gather the 32-column records, THEN pad rows to the 128-lane kernel
        # layout: the random row gather is bytes-bound (~10 ns per 512 B row),
        # so gathering unpadded rows moves 4x fewer bytes and the lane pad
        # becomes one dense copy.
        stream = _pad_lanes(stream_src[tris_sorted[:cap]])
        stream = jnp.pad(stream, ((0, STREAM_SLACK), (0, 0)))
        overflow = overflow + (bounds[NT] > cap).astype(jnp.int32)
        return BinnedTriangles(
            idx=None, counts=scounts[:, None], overflow=overflow,
            stream=stream, offs=offs,
        )

    gidx = jnp.clip(bounds[:-1, None] + jnp.arange(K, dtype=jnp.int32)[None, :], 0, P - 1)
    idx = tris_sorted[gidx]  # [NT, K]; slots beyond counts are padding
    return BinnedTriangles(
        idx=_pad_slots(idx, K), counts=counts[:, None], overflow=overflow
    )


def _flat_pixels(yoff, tile_h, tile_w, txi):
    """Pixel-center coordinates for tile column `txi` of this grid row,
    flattened row-major to (1, tile_h * tile_w): pixels live purely in VPU
    lanes so per-triangle coefficients broadcast as (CHUNK, 1) x (1, P) — the
    row-scaling pattern Mosaic lowers to native lane broadcasts, with zero
    scalar extracts."""
    ty = pl.program_id(0)
    P = tile_h * tile_w
    y0 = (yoff + ty * tile_h).astype(jnp.float32)
    x0 = jnp.float32(txi * tile_w)
    fi = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    # Row/col from the flat index in f32 (exact: fi < 2^20 and the quotient's
    # distance to the next integer exceeds f32 rounding error at these
    # magnitudes) — integer div/mod lowers far worse on the VPU.
    row = jnp.floor(fi * (1.0 / tile_w))
    py = y0 + 0.5 + row
    px = x0 + 0.5 + (fi - row * tile_w)
    return px, py


def _chunk_raster(fetch_chunk, n, px, py, channels):
    """Rasterize `n` binned triangles CHUNK at a time with triangles in VPU
    sublanes and pixels in lanes.

    The sequential z-test loop (one triangle per iteration, ~15 scalar VMEM
    extracts each — measured ~480 cycles of scalar floor per triangle) becomes:
    load a (CHUNK, stride) record block, evaluate all edge functions / depths as
    (CHUNK, P) tensors, then resolve the chunk's winner per pixel exactly:

      * depth-LESS first-wins: mask ineligible z to 2.0, min over sublanes, and
        break ties toward the LOWEST slot (submission order) via a masked
        index-min — identical semantics to the sequential loop.
      * the stored depth/attributes are the winner's own values, selected by
        one-hot sum with a -0.0 fill (x + (-0.0) == x bitwise for every float,
        including NaN), so outputs stay BIT-identical to raster_ref.

    `channels` is a list of specs: ("interp", offset, stride3_step, init) for
    perspective-correct attributes, ("const", column, init) for per-triangle
    constants.  Returns (depth, ch0, ch1, ...) each shaped (1, P) — the caller
    reshapes to the 2D tile once.
    """
    P = px.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)

    def body(c, carry):
        depth = carry[0]
        t = fetch_chunk(c)  # (CHUNK, stride)

        def col(F):
            return t[:, F : F + 1]  # (CHUNK, 1) lane slice

        x0v, y0v = col(TRI_X0), col(TRI_Y0)
        x1v, y1v = col(TRI_X1), col(TRI_Y1)
        x2v, y2v = col(TRI_X2), col(TRI_Y2)

        def edge(ax, ay, bx, by):
            # e(p) = cross2d(b - a, p - a); top-left tie bias (see raster_ref).
            A = ay - by
            B = bx - ax
            C = ax * by - bx * ay
            e = A * px + B * py + C  # (CHUNK, P)
            dx = bx - ax
            dy = by - ay
            tl = ((dy == 0.0) & (dx > 0.0)) | (dy < 0.0)
            return (e > 0.0) | ((e == 0.0) & tl), e

        c0, e0 = edge(x1v, y1v, x2v, y2v)
        c1, e1 = edge(x2v, y2v, x0v, y0v)
        c2, e2 = edge(x0v, y0v, x1v, y1v)
        covered = c0 & c1 & c2

        inv_area = 1.0 / col(TRI_AREA)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = e2 * inv_area
        z = b0 * col(TRI_Z0) + b1 * col(TRI_Z1) + b2 * col(TRI_Z2)

        # In-bounds slot + valid record (padding chunks mask off entirely).
        ok = (col(TRI_VALID) > 0.0) & (slot + (c * CHUNK) < n)
        elig = covered & ok & (z >= 0.0) & (z <= 1.0)
        zm = jnp.where(elig, z, 2.0)  # NaN z fails the range test -> masked
        zmin = jnp.min(zm, axis=0, keepdims=True)  # (1, P)

        # First eligible triangle attaining zmin wins (submission order).
        cand = jnp.where(zm == zmin, slot, 1e9)
        win = jnp.min(cand, axis=0, keepdims=True)
        onehot = slot == win  # (CHUNK, P)

        def select(attr):
            # Winner's exact bits: x + (-0.0) == x for all x (incl. NaN).
            return jnp.sum(jnp.where(onehot, attr, -0.0), axis=0, keepdims=True)

        zsel = select(zm)
        passes = zmin < depth  # strict: an equal-z later chunk loses
        out = [jnp.where(passes, zsel, depth)]
        if len(carry) > 1:
            rw = b0 * col(TRI_RW0) + b1 * col(TRI_RW1) + b2 * col(TRI_RW2)
            inv_rw = 1.0 / jnp.where(rw == 0.0, 1.0, rw)
            for spec, old in zip(channels, carry[1:]):
                if spec[0] == "interp":
                    _, o, step, _ = spec
                    attr = (
                        b0 * col(o) + b1 * col(o + step) + b2 * col(o + 2 * step)
                    ) * inv_rw
                else:
                    _, o, _ = spec
                    attr = col(o)  # (CHUNK, 1), broadcasts inside select
                out.append(jnp.where(passes, select(attr), old))
        return tuple(out)

    init = (jnp.ones((1, P), jnp.float32),) + tuple(
        jnp.full((1, P), spec[-1], jnp.float32) for spec in channels
    )
    nchunks = (n + CHUNK - 1) // CHUNK
    return jax.lax.fori_loop(0, nchunks, body, init)


def _records_fetch(tris_ref, g):
    """Chunk fetch from sub-tile `g` of a (G, K, stride) record row-block."""

    def fetch(c):
        return tris_ref[g, pl.ds(c * CHUNK, CHUNK), :]

    return fetch


def _indirect_fetch(idx_ref, packed_ref, g):
    """Chunk fetch via sub-tile `g`'s triangle ids ((G, K, 1) block — dynamic
    SUBLANE indexing; Mosaic cannot scalar-load a dynamic lane) into the
    VMEM-resident packed array: CHUNK dynamic row loads assembled into one
    (CHUNK, stride) block."""

    def fetch(c):
        rows = [
            packed_ref[pl.ds(idx_ref[g, c * CHUNK + i, 0], 1), :]
            for i in range(CHUNK)
        ]
        return jnp.concatenate(rows, axis=0)

    return fetch


# Manual segment DMA for the compacted record stream: rows per fixed-size copy
# in the ladder, and the stream slack rows kernels may harmlessly over-read.
STREAM_COPY_ROWS = 512
STREAM_SLACK = 16384


def _pick_group_stream(ntx: int, K: int) -> int:
    """Largest divisor of ntx whose per-step scratch segment fits ~4 MB."""
    budget = 4 << 20
    g = ntx
    while g > 1 and (g * K * 512 > budget or ntx % g):
        g -= 1
    return g


def _stream_fetch(scratch, local_off):
    """Chunk fetch from the step's VMEM scratch copy of the record stream;
    `local_off` is this sub-tile's CHUNK-aligned offset within the segment."""

    def fetch(c):
        return scratch[pl.ds(local_off + c * CHUNK, CHUNK), :]

    return fetch


def _copy_group_segment(offs_ref, stream_ref, scratch, sem, tile0, group, max_rows):
    """DMA this grid step's contiguous stream span [offs[tile0], offs[tile0+G])
    into scratch.  Fixed-size copy ladder (DMA sizes must be static): issues
    ceil(total / STREAM_COPY_ROWS) copies, so a typical step (avg ~70 live
    rows) moves one 256 KB block instead of the dense G*K*512B block — and,
    frame-wide, ~stream-cap rows instead of tiles*K (~25x less DMA).
    Returns the span's start row."""
    start = offs_ref[tile0]
    total = offs_ref[tile0 + group] - start
    ncopies = -(-max_rows // STREAM_COPY_ROWS)
    copies = [
        pltpu.make_async_copy(
            stream_ref.at[
                pl.ds(start + i * STREAM_COPY_ROWS, STREAM_COPY_ROWS), :
            ],
            scratch.at[pl.ds(i * STREAM_COPY_ROWS, STREAM_COPY_ROWS), :],
            sem,
        )
        for i in range(ncopies)
    ]
    for i, cp in enumerate(copies):

        @pl.when(i * STREAM_COPY_ROWS < total)
        def _(cp=cp):
            cp.start()

    for i, cp in enumerate(copies):

        @pl.when(i * STREAM_COPY_ROWS < total)
        def _(cp=cp):
            cp.wait()

    return start


def _copy_group_segment_db(offs_ref, stream_ref, scratch, sems, ntx, group,
                           max_rows):
    """Double-buffered variant of _copy_group_segment: each grid step PREFETCHES
    the NEXT step's stream segment into the other half of `scratch` and only
    then waits for its own half (started by the previous step), so the segment
    DMA crosses HBM underneath the previous step's raster/shade body instead of
    stalling every step on its own copy ladder.

    `scratch` holds TWO max_rows slots ([2 * nladder, 128]); `sems` is a (2,)
    DMA-semaphore array — one per slot, so the prefetch completing early can
    never satisfy the current step's wait.  Grid steps execute sequentially
    ("arbitrary" dims), so slot i%2 is free for reuse by step i+2's prefetch by
    the time step i+1 issues it.  Returns (segment start row, slot row offset);
    fetches read scratch at slot_offset + local."""
    ngx = pl.num_programs(1)
    nsteps = pl.num_programs(0) * ngx
    i = pl.program_id(0) * ngx + pl.program_id(1)
    slot = jax.lax.rem(i, 2)
    nladder = scratch.shape[0] // 2
    ncopies = -(-max_rows // STREAM_COPY_ROWS)

    def ladder(step, slot_idx, phase):
        t0 = (step // ngx) * ntx + jax.lax.rem(step, ngx) * group
        s0 = offs_ref[t0]
        total = offs_ref[t0 + group] - s0
        row0 = slot_idx * nladder
        for c in range(ncopies):
            cp = pltpu.make_async_copy(
                stream_ref.at[
                    pl.ds(s0 + c * STREAM_COPY_ROWS, STREAM_COPY_ROWS), :
                ],
                scratch.at[
                    pl.ds(row0 + c * STREAM_COPY_ROWS, STREAM_COPY_ROWS), :
                ],
                sems.at[slot_idx],
            )

            @pl.when(c * STREAM_COPY_ROWS < total)
            def _(cp=cp):
                if phase == "start":
                    cp.start()
                else:
                    cp.wait()

    @pl.when(i == 0)
    def _():
        ladder(i, slot, "start")

    @pl.when(i + 1 < nsteps)
    def _():
        ladder(i + 1, 1 - slot, "start")

    ladder(i, slot, "wait")
    tile0 = pl.program_id(0) * ntx + pl.program_id(1) * group
    return offs_ref[tile0], slot * nladder


# Channel specs for the staged full rasterizer (FragmentPlanes contract).
_RASTER_CHANNELS = (
    ("interp", TRI_N0, 3, 0.0),
    ("interp", TRI_N0 + 1, 3, 0.0),
    ("interp", TRI_N0 + 2, 3, 0.0),
    ("interp", TRI_UV0, 2, 0.0),
    ("interp", TRI_UV0 + 1, 2, 0.0),
    ("const", TRI_MESH_ID, -1.0),  # -1 = background
)


def _raster_kernel_stream(
    counts_ref, yoff_ref, offs_ref, stream_ref, out_ref, scratch, sem,
    *, tile_h, tile_w, ntx, group, max_rows, local_clamp, db=False
):
    """Full rasterization of a group row -> the 8 fragment planes, reading the
    compacted record stream via a manual segment DMA (see _copy_group_segment)."""
    ty = pl.program_id(0)
    gx = pl.program_id(1)
    tile0 = ty * ntx + gx * group
    if db:
        start, soff = _copy_group_segment_db(
            offs_ref, stream_ref, scratch, sem, ntx, group, max_rows
        )
    else:
        start = _copy_group_segment(
            offs_ref, stream_ref, scratch, sem, tile0, group, max_rows
        )
        soff = 0
    yoff = yoff_ref[0]
    shape = (tile_h, tile_w)
    for g in range(group):
        txi = gx * group + g
        px, py = _flat_pixels(yoff, tile_h, tile_w, txi)
        local = jnp.minimum(offs_ref[tile0 + g] - start, local_clamp)
        depth, nx, ny, nz, uu, vv, mid = _chunk_raster(
            _stream_fetch(scratch, soff + local),
            counts_ref[tile0 + g], px, py, _RASTER_CHANNELS,
        )
        sl = slice(g * tile_w, (g + 1) * tile_w)
        out_ref[PLANE_DEPTH, :, sl] = depth.reshape(shape)
        out_ref[PLANE_NX, :, sl] = nx.reshape(shape)
        out_ref[PLANE_NY, :, sl] = ny.reshape(shape)
        out_ref[PLANE_NZ, :, sl] = nz.reshape(shape)
        out_ref[PLANE_U, :, sl] = uu.reshape(shape)
        out_ref[PLANE_V, :, sl] = vv.reshape(shape)
        out_ref[PLANE_MID, :, sl] = mid.reshape(shape)
        out_ref[PLANE_PAD, :, sl] = jnp.zeros(shape, jnp.float32)


def _raster_kernel_indirect(
    counts_ref, yoff_ref, idx_ref, packed_ref, out_ref,
    *, tile_h, tile_w, ntx, group
):
    """Indirect variant: the whole packed triangle array stays resident in VMEM
    and tiles fetch rows by id — no per-tile record gather traffic.  Used when
    the packed array fits the VMEM budget (small/medium scenes)."""
    ty = pl.program_id(0)
    gx = pl.program_id(1)
    yoff = yoff_ref[0]
    shape = (tile_h, tile_w)
    for g in range(group):
        txi = gx * group + g
        tile = ty * ntx + txi
        px, py = _flat_pixels(yoff, tile_h, tile_w, txi)
        depth, nx, ny, nz, uu, vv, mid = _chunk_raster(
            _indirect_fetch(idx_ref, packed_ref, g), counts_ref[tile], px, py,
            _RASTER_CHANNELS,
        )
        sl = slice(g * tile_w, (g + 1) * tile_w)
        out_ref[PLANE_DEPTH, :, sl] = depth.reshape(shape)
        out_ref[PLANE_NX, :, sl] = nx.reshape(shape)
        out_ref[PLANE_NY, :, sl] = ny.reshape(shape)
        out_ref[PLANE_NZ, :, sl] = nz.reshape(shape)
        out_ref[PLANE_U, :, sl] = uu.reshape(shape)
        out_ref[PLANE_V, :, sl] = vv.reshape(shape)
        out_ref[PLANE_MID, :, sl] = mid.reshape(shape)
        out_ref[PLANE_PAD, :, sl] = jnp.zeros(shape, jnp.float32)


def _depth_kernel_stream(
    counts_ref, yoff_ref, offs_ref, stream_ref, out_ref, scratch, sem,
    *, tile_h, tile_w, ntx, group, max_rows, local_clamp, db=False
):
    """Depth-only rasterization of a group row: _chunk_raster with no attribute
    channels — used for the light-culling depth prepass and the shadow-map pass
    (both consume depth alone).  BIT-identical depth to the full rasterizer's."""
    ty = pl.program_id(0)
    gx = pl.program_id(1)
    tile0 = ty * ntx + gx * group
    if db:
        start, soff = _copy_group_segment_db(
            offs_ref, stream_ref, scratch, sem, ntx, group, max_rows
        )
    else:
        start = _copy_group_segment(
            offs_ref, stream_ref, scratch, sem, tile0, group, max_rows
        )
        soff = 0
    yoff = yoff_ref[0]
    for g in range(group):
        txi = gx * group + g
        # The clamp keeps scratch reads in bounds when earlier tiles' TRUE
        # pair counts exceeded K (the loud-overflow regime renders garbage for
        # the affected tiles but never reads out of bounds).
        local = jnp.minimum(offs_ref[tile0 + g] - start, local_clamp)
        (depth,) = _chunk_raster(
            _stream_fetch(scratch, soff + local),
            counts_ref[tile0 + g],
            *_flat_pixels(yoff, tile_h, tile_w, txi), (),
        )
        out_ref[:, g * tile_w : (g + 1) * tile_w] = depth.reshape(tile_h, tile_w)


def _depth_kernel_indirect(
    counts_ref, yoff_ref, idx_ref, packed_ref, out_ref,
    *, tile_h, tile_w, ntx, group
):
    ty = pl.program_id(0)
    gx = pl.program_id(1)
    yoff = yoff_ref[0]
    for g in range(group):
        txi = gx * group + g
        px, py = _flat_pixels(yoff, tile_h, tile_w, txi)
        (depth,) = _chunk_raster(
            _indirect_fetch(idx_ref, packed_ref, g), counts_ref[ty * ntx + txi],
            px, py, (),
        )
        out_ref[:, g * tile_w : (g + 1) * tile_w] = depth.reshape(tile_h, tile_w)


def rasterize_depth(
    packed: jnp.ndarray,
    aabb: jnp.ndarray,
    cfg: RendererConfig,
    binned: BinnedTriangles | None = None,
    interpret: bool = False,
    band_h: int | None = None,
    y_offset=0,
    return_overflow: bool = False,
) -> jnp.ndarray:
    """Depth-only tile-binned rasterization -> depth [H, W] float32 (cleared 1.0).

    Exactly the depth plane rasterize_binned would produce, at ~the z-test cost
    alone.  Used as the light-culling prepass (exact tile depth bounds for
    cull_lights_to_tiles) and for shadow maps.  Pass `binned` to reuse an
    existing binning.  The framebuffer size comes from cfg (shadow maps pass a
    cfg with width=height=S — binning hardcodes cfg.width, so a separate
    width override here could silently disagree with the binned tile grid).
    With return_overflow=True returns (depth, overflow): the binning's
    dropped-triangle tile count (the no-silent-drop contract)."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    T = packed.shape[0]
    if binned is None:
        valid = packed[:, TRI_VALID] > 0.0
        binned = bin_triangles(
            packed, aabb, valid, cfg, band_h=band_h or H, y_offset=y_offset,
            stream_src=packed if T > VMEM_INDIRECTION_SLOTS else None,
        )
    K = -(-min(cfg.max_tris_per_tile, T) // CHUNK) * CHUNK
    yoff = jnp.asarray(y_offset, jnp.int32).reshape(1)
    out_shape = jax.ShapeDtypeStruct((Hp, Wp), jnp.float32)

    if T <= VMEM_INDIRECTION_SLOTS:
        K = binned.idx.shape[1]
        kernel = functools.partial(
            _depth_kernel_indirect, tile_h=TH, tile_w=TW, ntx=ntx, group=1
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
            out_specs=pl.BlockSpec(
                (TH, TW), lambda ty, tx, *_: (ty, tx), memory_space=pltpu.VMEM
            ),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.idx[..., None], packed)
    else:
        if binned.stream is None:
            binned = binned.with_stream(packed, cfg.bin_stream_cap, STREAM_SLACK)
        G = _pick_group_stream(ntx, K)
        max_rows = G * K
        assert max_rows <= STREAM_SLACK, "stream slack must cover a group span"
        nladder = -(-max_rows // STREAM_COPY_ROWS) * STREAM_COPY_ROWS
        db = cfg.stream_dma_db
        kernel = functools.partial(
            _depth_kernel_stream, tile_h=TH, tile_w=TW, ntx=ntx, group=G,
            max_rows=max_rows, local_clamp=nladder - K, db=db,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nty, ntx // G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (TH, G * TW), lambda ty, gx, *_: (ty, gx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(((2 if db else 1) * nladder, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)) if db else pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.offs, binned.stream)

    if return_overflow:
        return out[:H, :W], binned.overflow
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
    return_overflow: bool = False,
):
    """Tile-binned Pallas rasterization -> FragmentPlanes (same contract as
    raster_ref.rasterize_packed).

    With `band_h`/`y_offset`, rasterizes only rows [y_offset, y_offset + band_h)
    of the full frame (y_offset may be traced) — the screen-sharded multi-chip
    path runs this per band.  With return_overflow=True, returns
    (FragmentPlanes, overflow) where overflow counts tiles whose triangle list
    exceeded the K cap (those tiles silently lose geometry — frame.render
    threads this to the runtime overflow warning)."""
    H = band_h or cfg.height
    W = cfg.width
    TH, TW = cfg.tile_h, cfg.tile_w
    nty, ntx = -(-H // TH), -(-W // TW)
    Hp, Wp = nty * TH, ntx * TW

    T = packed.shape[0]
    valid = packed[:, TRI_VALID] > 0.0
    binned = bin_triangles(
        packed, aabb, valid, cfg, band_h=band_h, y_offset=y_offset,
        stream_src=packed if T > VMEM_INDIRECTION_SLOTS else None,
    )
    K = -(-min(cfg.max_tris_per_tile, T) // CHUNK) * CHUNK
    yoff = jnp.asarray(y_offset, jnp.int32).reshape(1)
    out_shape = jax.ShapeDtypeStruct((NUM_PLANES, Hp, Wp), jnp.float32)

    if T <= VMEM_INDIRECTION_SLOTS:
        K = binned.idx.shape[1]
        kernel = functools.partial(
            _raster_kernel_indirect, tile_h=TH, tile_w=TW, ntx=ntx, group=1
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
            out_specs=pl.BlockSpec(
                (NUM_PLANES, TH, TW), lambda ty, tx, *_: (0, ty, tx),
                memory_space=pltpu.VMEM,
            ),
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.idx[..., None], packed)
    else:
        G = _pick_group_stream(ntx, K)
        max_rows = G * K
        assert max_rows <= STREAM_SLACK, "stream slack must cover a group span"
        nladder = -(-max_rows // STREAM_COPY_ROWS) * STREAM_COPY_ROWS
        db = cfg.stream_dma_db
        kernel = functools.partial(
            _raster_kernel_stream, tile_h=TH, tile_w=TW, ntx=ntx, group=G,
            max_rows=max_rows, local_clamp=nladder - K, db=db,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nty, ntx // G),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (NUM_PLANES, TH, G * TW), lambda ty, gx, *_: (0, ty, gx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(((2 if db else 1) * nladder, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)) if db else pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
        )(binned.counts[:, 0], yoff, binned.offs, binned.stream)

    out = out[:, :H, :W]
    frags = FragmentPlanes(
        depth=out[PLANE_DEPTH],
        normal=jnp.stack([out[PLANE_NX], out[PLANE_NY], out[PLANE_NZ]], axis=-1),
        uv=jnp.stack([out[PLANE_U], out[PLANE_V]], axis=-1),
        mesh_id=out[PLANE_MID].astype(jnp.int32),
    )
    if return_overflow:
        return frags, binned.overflow
    return frags

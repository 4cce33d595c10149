"""Measurement-first probes for the two remaining perf levers (round 3).

1. Window-gather PCF viability (config 4): for every covered 2x2 pixel quad,
   the spread of the bilinear-footprint integer bases in the shadow map.  If
   most quads span <= 2 texels per axis, ONE 4x4-window row-gather per quad can
   replace four 2x2-quad row-gathers (4x fewer gathers on the dominant
   config-4 stage); quads that spread wider need a per-pixel fallback whose
   size this measures.

2. Early-z chunk skip (headline): fraction of binned raster chunks whose
   triangles all start behind the tile's final max depth (from the prepass the
   fused path already renders).  Bounds the mono-kernel work an in-kernel
   chunk skip could drop.

Run on the real chip (one process!): python tools/exp_levers.py
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.transform import (
    TRI_VALID, TRI_Z0, setup_frame_triangles,
)
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def pcf_quad_spread(n_frames: int = 8):
    """Histogram the per-quad shadow-UV base spread over an animated orbit."""
    from d3d12_deferred_renderer_tpu.ops.shadows import render_shadow_map
    from d3d12_deferred_renderer_tpu.scene import animate

    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True, shadows=True,
        normal_mapping=True, bloom=True, max_lights_per_tile=128,
        shadow_vis_downsample=1,
    )
    _, state, _ = build(cfg)
    S = cfg.shadow_map_size

    @jax.jit
    def frame_spread(st):
        st = animate(st, cfg.yaw_per_frame, cfg)
        tris, view_proj = setup_frame_triangles(st, cfg)
        from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
            bin_triangles, rasterize_depth,
        )
        valid = tris.packed[:, TRI_VALID] > 0.0
        binned = bin_triangles(tris.packed, tris.aabb, valid, cfg,
                               stream_src=tris.packed)
        depth = rasterize_depth(tris.packed, tris.aabb, cfg, binned=binned)
        _, lvp = render_shadow_map(st, cfg)

        H, W = depth.shape
        xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * (2.0 / W) - 1.0
        ys = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) * (2.0 / H)
        ndc_y, ndc_x = jnp.meshgrid(ys, xs, indexing="ij")
        M = jnp.linalg.inv(view_proj) @ lvp
        lc = (ndc_x[..., None] * M[0] + ndc_y[..., None] * M[1]
              + depth[..., None] * M[2] + M[3])
        ndc = lc[..., :3] / jnp.maximum(lc[..., 3:4], 1e-8)
        u = (ndc[..., 0] + 1.0) * 0.5
        v = (1.0 - ndc[..., 1]) * 0.5
        x0 = jnp.floor(u * S - 0.5)
        y0 = jnp.floor(v * S - 0.5)
        cov = depth < 1.0

        def spread(base):
            q = base.reshape(H // 2, 2, W // 2, 2)
            c = cov.reshape(H // 2, 2, W // 2, 2)
            hi = jnp.max(jnp.where(c, q, -jnp.inf), axis=(1, 3))
            lo = jnp.min(jnp.where(c, q, jnp.inf), axis=(1, 3))
            return hi - lo  # -inf for empty quads

        sx = spread(x0)
        sy = spread(y0)
        qcov = cov.reshape(H // 2, 2, W // 2, 2).any(axis=(1, 3))
        s = jnp.maximum(sx, sy)
        n_cov = jnp.sum(qcov)
        hist = jnp.stack([
            jnp.sum(qcov & (s <= 0)), jnp.sum(qcov & (s <= 1)),
            jnp.sum(qcov & (s <= 2)), jnp.sum(qcov & (s <= 3)),
            jnp.sum(qcov & (s <= 4)),
        ])
        return st, n_cov, hist

    tot_cov = 0
    tot = np.zeros(5, np.int64)
    st = state
    for _ in range(n_frames):
        st, n_cov, hist = frame_spread(st)
        tot_cov += int(n_cov)
        tot += np.asarray(hist)
    print(f"[pcf] covered quads over {n_frames} frames: {tot_cov}")
    for i, lbl in enumerate(["<=0", "<=1", "<=2", "<=3", "<=4"]):
        print(f"[pcf] spread {lbl}: {tot[i] / max(tot_cov, 1):.4f}")


def earlyz_chunks(n_frames: int = 8):
    """Fraction of (tile, chunk) raster work provably behind the final depth."""
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
        CHUNK, bin_triangles, rasterize_depth,
    )
    from d3d12_deferred_renderer_tpu.scene import animate

    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, _ = build(cfg)
    TH, TW = cfg.tile_h, cfg.tile_w

    @jax.jit
    def frame_counts(st):
        st = animate(st, cfg.yaw_per_frame, cfg)
        tris, _ = setup_frame_triangles(st, cfg)
        valid = tris.packed[:, TRI_VALID] > 0.0
        # Dense id layout (analysis only; the shipping path streams records).
        binned = bin_triangles(tris.packed, tris.aabb, valid, cfg)
        depth = rasterize_depth(tris.packed, tris.aabb, cfg, binned=binned)

        H, W = depth.shape
        nty, ntx = H // TH, W // TW
        tile_zmax = (depth.reshape(nty, TH, ntx, TW)
                     .transpose(0, 2, 1, 3).reshape(nty * ntx, -1).max(axis=1))

        z = tris.packed[:, TRI_Z0:TRI_Z0 + 3].min(axis=1)  # [T] tri min z
        NT, K = binned.idx.shape
        slot = jnp.arange(K, dtype=jnp.int32)[None, :]
        live = slot < binned.counts  # [NT, K]
        zt = jnp.where(live, z[binned.idx], jnp.inf)
        zc = zt.reshape(NT, K // CHUNK, CHUNK).min(axis=2)  # [NT, nchunk]
        has_work = jnp.isfinite(zc)
        skippable = has_work & (zc > tile_zmax[:, None])
        return st, jnp.sum(has_work), jnp.sum(skippable)

    tot_w = tot_s = 0
    st = state
    for _ in range(n_frames):
        st, w, s = frame_counts(st)
        tot_w += int(w)
        tot_s += int(s)
    print(f"[earlyz] chunks with work: {tot_w}, provably occluded: {tot_s} "
          f"({tot_s / max(tot_w, 1):.3f})")


if __name__ == "__main__":
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "run on the chip"
    pcf_quad_spread()
    earlyz_chunks()

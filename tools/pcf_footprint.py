"""Measure per-screen-tile shadow-map footprints on the config-4 scene.

Design probe for the windowed-PCF kernel: for each covered (8, 128) screen
tile, the 2x2-bilinear footprints of its pixels span a rectangle of shadow-map
texels.  If that rectangle (plus the +1 bilinear tap) fits a fixed [WR, WC]
window, the tile's PCF can run as one window DMA + one-hot MXU row-select +
VPU column-select instead of ~1024 per-pixel HBM row-gathers.  This tool
reports the span distribution and the fraction of covered tiles fitting
candidate windows (with block-aligned window bases, which is what a BlockSpec
index_map can express), over a yaw orbit.

Run on the TPU (the prepass depth comes from the Pallas kernel); one process.
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
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.ops import shadows
from d3d12_deferred_renderer_tpu.ops.transform import setup_frame_triangles
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def tile_footprints(state, cfg):
    """Per-(8,128)-tile shadow footprint: (covered, ymin, ymax, xmin, xmax)
    over the tile's geometry pixels, in integer texel base coords (x0 = floor
    of the bilinear base; the footprint additionally reads x0+1/y0+1)."""
    tris, view_proj = setup_frame_triangles(state, cfg)
    from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_depth

    depth, _ = rasterize_depth(tris.packed, tris.aabb, cfg, return_overflow=True)
    lvp = shadows.light_view_proj(state.lights.direction)

    H, W = depth.shape
    S = cfg.shadow_map_size
    TH, TW = 8, 128
    nty, ntx = H // TH, W // TW
    NT = nty * ntx
    P = TH * TW

    ys = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) * (2.0 / H)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * (2.0 / W) - 1.0
    ndc_y, ndc_x = jnp.meshgrid(ys, xs, indexing="ij")
    M = jnp.linalg.inv(view_proj) @ lvp
    lc = (
        ndc_x[..., None] * M[0]
        + ndc_y[..., None] * M[1]
        + depth[..., None] * M[2]
        + M[3]
    )
    ndc = lc[..., :3] / jnp.maximum(lc[..., 3:4], 1e-8)
    u = (ndc[..., 0] + 1.0) * 0.5
    v = (1.0 - ndc[..., 1]) * 0.5
    fx = u * S - 0.5
    fy = v * S - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), -1, S - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), -1, S - 1)
    geom = depth < 1.0

    def tiles(a):
        return a.reshape(nty, TH, ntx, TW).transpose(0, 2, 1, 3).reshape(NT, P)

    g = tiles(geom)
    x0t, y0t = tiles(x0), tiles(y0)
    big = jnp.int32(1 << 20)
    xmin = jnp.where(g, x0t, big).min(axis=1)
    xmax = jnp.where(g, x0t, -big).max(axis=1)
    ymin = jnp.where(g, y0t, big).min(axis=1)
    ymax = jnp.where(g, y0t, -big).max(axis=1)
    covered = g.any(axis=1)
    return covered, ymin, ymax, xmin, xmax


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "run on the TPU"
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True, shadows=True,
        normal_mapping=True, bloom=True, max_lights_per_tile=128,
        inkernel_light_cull=False,
    )
    _, state, _ = build(cfg)

    fp = jax.jit(tile_footprints, static_argnums=(1,))

    spans_r, spans_c, n_cov = [], [], []
    n_frames = 24
    for i in range(n_frames):
        # Stride the full 2*pi clock (same sampling the binning tiers used).
        state = fr.animate(
            state, (2 * np.pi) / n_frames, cfg
        )
        cov, ymin, ymax, xmin, xmax = jax.device_get(fp(state, cfg))
        cov = cov.astype(bool)
        # +1: the bilinear footprint reads base and base+1.
        rs = (ymax - ymin + 2)[cov]
        cs = (xmax - xmin + 2)[cov]
        spans_r.append(rs)
        spans_c.append(cs)
        n_cov.append(int(cov.sum()))

    rs = np.concatenate(spans_r)
    cs = np.concatenate(spans_c)
    print(f"covered tiles/frame: min {min(n_cov)} max {max(n_cov)}")
    for name, a in (("rowspan", rs), ("colspan", cs)):
        q = np.percentile(a, [50, 90, 99, 99.9, 100])
        print(f"{name}: p50 {q[0]:.0f}  p90 {q[1]:.0f}  p99 {q[2]:.0f}  "
              f"p99.9 {q[3]:.0f}  max {q[4]:.0f}")

    # Window fit with BLOCK-ALIGNED bases (rows quantized to 8, cols to 128 —
    # what a BlockSpec index_map can address): a tile fits iff its span fits
    # after flooring the base to the block grid.
    for WR in (16, 24, 32):
        for WC in (256, 384, 512):
            fit_r = rs <= (WR - 7)   # worst-case base misalignment: 8-1
            fit_c = cs <= (WC - 127)
            fit = (fit_r & fit_c).mean()
            print(f"window [{WR:3d},{WC:3d}]: fits {100 * fit:6.2f}% of covered tiles")


if __name__ == "__main__":
    main()

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
    z = ndc[..., 2]
    inside = (
        (ndc[..., 0] >= -1.0) & (ndc[..., 0] <= 1.0)
        & (ndc[..., 1] >= -1.0) & (ndc[..., 1] <= 1.0)
        & (z >= 0.0) & (z <= 1.0)
    )
    # Pixels outside the light frustum take vis=1.0 without needing taps, and
    # background pixels shade black regardless — only geometry pixels inside
    # the frustum constrain the window.
    geom = (depth < 1.0) & inside

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
    return covered, ymin, ymax, xmin, xmax, g, x0t, y0t, tiles(depth)


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
    px_unfit = {}  # (WR, WC) -> [frac of geometry pixels outside the window]
    tile_unfit = {}
    n_frames = 24
    cands = [(16, 128), (16, 256), (24, 256), (32, 256), (32, 384), (48, 512)]
    for i in range(n_frames):
        # Stride the full 2*pi clock (same sampling the binning tiers used).
        state = fr.animate(
            state, (2 * np.pi) / n_frames, cfg
        )
        cov, ymin, ymax, xmin, xmax, g, x0t, y0t, dts = jax.device_get(
            fp(state, cfg)
        )
        cov = cov.astype(bool)
        g = g.astype(bool)
        # +1: the bilinear footprint reads base and base+1.
        rs = (ymax - ymin + 2)[cov]
        cs = (xmax - xmin + 2)[cov]
        spans_r.append(rs)
        spans_c.append(cs)
        n_cov.append(int(cov.sum()))
        # Per-pixel fit: window based at the tile's (min y0, min x0), base
        # quantized down to (8, 128) blocks; a pixel fits iff its base+1 tap
        # stays inside the window.
        by = (ymin // 8) * 8
        bx = (xmin // 128) * 128
        npix = max(1, int(g.sum()))
        for WR, WC in cands:
            ok_r = (y0t + 1) < (by[:, None] + WR)
            ok_c = (x0t + 1) < (bx[:, None] + WC)
            fit = ok_r & ok_c
            unfit_px = int((g & ~fit).sum())
            px_unfit.setdefault((WR, WC), []).append(unfit_px / npix)
            tfit = (g & ~fit).any(axis=1)
            tile_unfit.setdefault((WR, WC), []).append(
                int(tfit.sum()) / max(1, int(cov.sum()))
            )

    rs = np.concatenate(spans_r)
    cs = np.concatenate(spans_c)
    print(f"covered tiles/frame: min {min(n_cov)} max {max(n_cov)}")
    for name, a in (("rowspan", rs), ("colspan", cs)):
        q = np.percentile(a, [50, 90, 99, 99.9, 100])
        print(f"{name}: p50 {q[0]:.0f}  p90 {q[1]:.0f}  p99 {q[2]:.0f}  "
              f"p99.9 {q[3]:.0f}  max {q[4]:.0f}")
    for WR, WC in cands:
        pu = np.asarray(px_unfit[(WR, WC)])
        tu = np.asarray(tile_unfit[(WR, WC)])
        print(
            f"window [{WR:3d},{WC:3d}]: unfit pixels mean {100 * pu.mean():6.3f}% "
            f"max {100 * pu.max():6.3f}%  | tiles w/ any unfit px mean "
            f"{100 * tu.mean():5.1f}%"
        )

    # --- Strip-level windows: one (1, 128)-pixel row strip per window, base
    # at the strip's (min y0, min x0), element-granular (dynamic slice). ---
    state2 = state
    strip_cands = [(8, 128), (16, 64), (16, 96), (24, 96), (32, 96), (32, 192)]
    s_unfit = {k: [] for k in strip_cands}
    for i in range(8):
        state2 = fr.animate(state2, (2 * np.pi) / 8, cfg)
        cov, ymin, ymax, xmin, xmax, g, x0t, y0t, dts = jax.device_get(
            fp(state2, cfg)
        )
        g = g.astype(bool)
        NTt, P = g.shape
        gs = g.reshape(NTt * 8, 128)
        x0s = x0t.reshape(NTt * 8, 128)
        y0s = y0t.reshape(NTt * 8, 128)
        big = 1 << 20
        bys = np.where(gs, y0s, big).min(axis=1)
        bxs = np.where(gs, x0s, big).min(axis=1)
        npix = max(1, int(gs.sum()))
        for WR, WC in strip_cands:
            ok = ((y0s + 1) < (bys[:, None] + WR)) & (
                (x0s + 1) < (bxs[:, None] + WC)
            )
            s_unfit[(WR, WC)].append(int((gs & ~ok).sum()) / npix)
    for WR, WC in strip_cands:
        pu = np.asarray(s_unfit[(WR, WC)])
        print(
            f"strip window [{WR:3d},{WC:3d}]: unfit pixels mean "
            f"{100 * pu.mean():6.3f}% max {100 * pu.max():6.3f}%"
        )

    # --- Two depth-clustered windows per strip: a strip crossing an object
    # silhouette holds two surfaces whose footprints are far apart; split the
    # strip's pixels at mid-depth and give each cluster its own window. ---
    state3 = state
    cl_cands = [(8, 64), (16, 64), (16, 96), (24, 96)]
    c_unfit = {k: [] for k in cl_cands}
    for i in range(8):
        state3 = fr.animate(state3, (2 * np.pi) / 8, cfg)
        cov, ymin, ymax, xmin, xmax, g, x0t, y0t, dts = jax.device_get(
            fp(state3, cfg)
        )
        g = g.astype(bool)
        NTt, P = g.shape
        gs = g.reshape(NTt * 8, 128)
        x0s = x0t.reshape(NTt * 8, 128)
        y0s = y0t.reshape(NTt * 8, 128)
        ds = dts.reshape(NTt * 8, 128)
        big = 1 << 20
        # Cluster by light-space ROW (y0): rowspan is the binding constraint,
        # so split the strip's pixels at mid-y0 — each cluster's row range is
        # at most half the strip's.
        big0 = 1 << 20
        ymn = np.where(gs, y0s, big0).min(axis=1)
        ymx = np.where(gs, y0s, -big0).max(axis=1)
        midy = (ymn + ymx) // 2
        c1 = y0s > midy[:, None]  # cluster id per pixel
        npix = max(1, int(gs.sum()))
        for WR, WC in cl_cands:
            ok = np.zeros_like(gs)
            for cid in (False, True):
                m = gs & (c1 == cid)
                by = np.where(m, y0s, big).min(axis=1)
                bx = np.where(m, x0s, big).min(axis=1)
                okc = ((y0s + 1) < (by[:, None] + WR)) & (
                    (x0s + 1) < (bx[:, None] + WC)
                )
                ok |= m & okc
            c_unfit[(WR, WC)].append(int((gs & ~ok).sum()) / npix)
    for WR, WC in cl_cands:
        pu = np.asarray(c_unfit[(WR, WC)])
        print(
            f"2-cluster strip window [{WR:3d},{WC:3d}]: unfit pixels mean "
            f"{100 * pu.mean():6.3f}% max {100 * pu.max():6.3f}%"
        )


if __name__ == "__main__":
    main()

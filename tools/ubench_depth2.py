"""Ablate the REAL depth prepass: same binned inputs/blocks, kernel variants.

  v_noop  — DMA the real record blocks, write constant (floor: steps+DMA)
  v_one   — run exactly ONE chunk per sub-tile (floor + 1 chunk each)
  v_full  — the real chunk loop (current kernel)

All deltas vs the shared f_bin base (animate+setup+bin), so the harness
dispatch floor cancels.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
    _chunk_raster, _flat_pixels, _pick_group, _records_fetch, bin_triangles,
)
from d3d12_deferred_renderer_tpu.ops.transform import TRI_VALID, setup_frame_triangles
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=15):
    print("  compiling...", flush=True)
    fn = jax.jit(fn)
    s, ck = fn(state)
    int(ck)
    t0 = time.time()
    for _ in range(n):
        s, ck = fn(s)
    int(ck)
    return (time.time() - t0) / n * 1e3


def make_depth(cfg, variant):
    TH, TW = cfg.tile_h, cfg.tile_w
    H, W = cfg.height, cfg.width
    nty, ntx = H // TH, W // TW

    def depth_fn(packed, binned):
        records = None  # dense-records path removed (stream only)
        K = binned.idx.shape[1]
        G = _pick_group(ntx, K, records.shape[-1])

        def kern(counts, tris_ref, out_ref):
            ty = pl.program_id(0)
            gx = pl.program_id(1)
            for g in range(G):
                txi = gx * G + g
                px, py = _flat_pixels(jnp.int32(0), TH, TW, txi)
                if variant == "noop":
                    d = jnp.full((1, TH * TW), 0.5, jnp.float32)
                elif variant == "one":
                    (d,) = _chunk_raster(
                        _records_fetch(tris_ref, g), jnp.int32(8), px, py, ()
                    )
                else:
                    (d,) = _chunk_raster(
                        _records_fetch(tris_ref, g), counts[ty * ntx + txi],
                        px, py, (),
                    )
                out_ref[:, g * TW : (g + 1) * TW] = d.reshape(TH, TW)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, ntx // G),
            in_specs=[
                pl.BlockSpec((G, K, records.shape[-1]),
                             lambda ty, gx, *_, _g=ntx // G: (ty * _g + gx, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TH, G * TW), lambda ty, gx, *_: (ty, gx),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        )(binned.counts[:, 0], records)

    return depth_fn


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, geo = build(cfg)

    def ck32(x):
        return jnp.sum(x.astype(jnp.float32))

    def f_bin(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg)
        return s, ck32(b.idx) + ck32(b.counts)

    base = timed(f_bin, state)
    print(f"bin base : {base:7.2f} ms", flush=True)

    def f_stream(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg)
        from d3d12_deferred_renderer_tpu.ops.raster_pallas import STREAM_SLACK
        b = b.with_stream(tris.packed, cfg.bin_stream_cap, STREAM_SLACK)
        return s, ck32(b.stream[:, 6]) + ck32(b.offs)
    g = timed(f_stream, state)
    print(f"+stream  : {g:7.2f} ms  (delta {g - base:+6.2f})", flush=True)

    from d3d12_deferred_renderer_tpu.ops.raster_pallas import rasterize_depth
    def f_kern(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        b = bin_triangles(tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg)
        d = rasterize_depth(tris.packed, tris.aabb, cfg, binned=b)
        return s, ck32(d)
    k = timed(f_kern, state)
    print(f"+kernel  : {k:7.2f} ms  (delta vs stream {k - g:+6.2f})", flush=True)
    for variant in ():
        dfn = make_depth(cfg, variant)

        def f(s, dfn=dfn):
            s = animate(s, cfg.yaw_per_frame, cfg)
            tris, vp = setup_frame_triangles(s, cfg)
            b = bin_triangles(
                tris.packed, tris.aabb, tris.packed[:, TRI_VALID] > 0, cfg
            )
            d = dfn(tris.packed, b)
            return s, ck32(d)

        ms = timed(f, state)
        print(f"{variant:>6}: {ms:7.2f} ms  (delta {ms - base:+6.2f})", flush=True)


if __name__ == "__main__":
    main()

"""Sub-stage breakdown of the config-4 shadow-map pass (1024^2 depth render)."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import xmath
from d3d12_deferred_renderer_tpu.ops.raster_pallas import (
    TRI_VALID, bin_triangles, rasterize_depth, VMEM_INDIRECTION_SLOTS,
)
from d3d12_deferred_renderer_tpu.ops.shadows import light_view_proj
from d3d12_deferred_renderer_tpu.ops.transform import _fv_transform_cols, _setup_cols
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=20):
    fn = jax.jit(fn)
    s, ck = fn(state)
    int(ck)
    t0 = time.time()
    for _ in range(n):
        s, ck = fn(s)
    int(ck)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True,
        shadows=True, normal_mapping=True, bloom=True, max_lights_per_tile=128,
        shadow_vis_downsample=1,
    )
    _, state, geo = build(cfg)
    S = cfg.shadow_map_size
    shadow_cfg = dataclasses.replace(cfg, width=S, height=S)

    def ck32(x):
        return jnp.sum(jnp.nan_to_num(x.astype(jnp.float32), posinf=1.0,
                                      neginf=-1.0))

    def f_setup(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        g = s.geometry
        model = xmath.model_matrix(s.position, s.orientation, s.scale)
        lvp = light_view_proj(s.lights.direction)
        c_cols, _, _ = _fv_transform_cols(g, model @ lvp, model, attrs=False)
        tris = _setup_cols(
            c_cols, None, None, g.tri_mesh_id, shadow_cfg, cull="none"
        )
        return s, tris

    def stage(upto):
        def f(s):
            s, tris = f_setup(s)
            if upto == "setup":
                return s, ck32(tris.packed) + ck32(tris.aabb)
            packed, aabb = tris.packed, tris.aabb
            valid = packed[:, TRI_VALID] > 0.0
            T = packed.shape[0]
            binned = bin_triangles(
                packed, aabb, valid, shadow_cfg, band_h=S,
                stream_src=packed if T > VMEM_INDIRECTION_SLOTS else None,
            )
            if upto == "bin":
                return s, ck32(binned.counts) + ck32(binned.offs)
            depth = rasterize_depth(packed, aabb, shadow_cfg, binned=binned)
            return s, ck32(depth)

        return f

    prev = 0.0
    for name in ("setup", "bin", "kernel"):
        ms = timed(stage(name), state)
        print(f"{name:>8}: {ms:7.2f} ms  (delta {ms - prev:+7.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

"""Stage-cost breakdown of setup_frame_triangles on the real chip."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu.ops.transform import (
    face_vertex_transform, triangle_setup, setup_frame_triangles,
    _clip_near_plane,
)
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=15):
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
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, geo = build(cfg)

    def ck32(x):
        return jnp.sum(x.astype(jnp.float32))

    def f_anim(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        return s, ck32(s.orientation)

    def f_vt(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        clip, wn, vp = face_vertex_transform(s, cfg)
        return s, ck32(clip) + ck32(wn)

    def f_clip(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        clip, wn, vp = face_vertex_transform(s, cfg)
        c = clip.reshape(-1, 3, 4)
        n = wn.reshape(-1, 3, 3)
        uv = s.geometry.fv_uvs.reshape(-1, 3, 2)
        c2, n2, uv2, dup = _clip_near_plane(c, n, uv)
        return s, ck32(c2) + ck32(n2)

    def f_full(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        tris, vp = setup_frame_triangles(s, cfg)
        return s, ck32(tris.packed) + ck32(tris.aabb)

    for name, fn in [("animate", f_anim), ("+fv_transform", f_vt),
                     ("+near_clip", f_clip), ("full_setup", f_full)]:
        ms = timed(fn, state)
        print(f"{name:>14}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Prefix-delta breakdown INSIDE the stacked triangle setup (flagship scene)."""
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
from d3d12_deferred_renderer_tpu.ops.transform import (
    _clip_near_plane_stack, _fv_transform_cols, _setup_cols, camera_matrices,
)
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
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, geo = build(cfg)

    def ck32(x):
        return jnp.sum(jnp.nan_to_num(x.astype(jnp.float32), posinf=1.0,
                                      neginf=-1.0))

    def pre(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        g = s.geometry
        model = xmath.model_matrix(s.position, s.orientation, s.scale)
        view, proj = camera_matrices(s, cfg)
        return s, g, model, model @ (view @ proj)

    def stage(upto):
        def f(s):
            s, g, model, mvp = pre(s)
            if upto == "matrices":
                return s, ck32(mvp)
            c, n, uv = _fv_transform_cols(g, mvp, model)
            if upto == "transform":
                return s, ck32(c) + ck32(n)
            c2, n2, uv2, dup = _clip_near_plane_stack(c, n, uv)
            if upto == "clip":
                return s, ck32(c2) + ck32(n2) + ck32(uv2)
            tris = _setup_cols(c, n, uv, g.tri_mesh_id, cfg)
            return s, ck32(tris.packed) + ck32(tris.aabb)

        return f

    prev = 0.0
    for name in ("matrices", "transform", "clip", "full"):
        ms = timed(stage(name), state)
        print(f"{name:>10}: {ms:7.2f} ms  (delta {ms - prev:+7.2f})", flush=True)
        prev = ms


if __name__ == "__main__":
    main()

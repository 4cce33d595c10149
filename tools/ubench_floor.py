"""Measure the state-evolving timing-loop FLOOR: what does returning the state
pytree itself cost (with and without donation), before any rendering work?"""
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
from d3d12_deferred_renderer_tpu.ops.transform import camera_matrices
from d3d12_deferred_renderer_tpu.scene import animate
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed(fn, state, n=30, donate=False):
    fn = jax.jit(fn, donate_argnums=(0,) if donate else ())
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

    def f_id(s):
        return s, jnp.sum(s.orientation)

    def f_anim(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        return s, jnp.sum(s.orientation)

    def f_mat(s):
        s = animate(s, cfg.yaw_per_frame, cfg)
        model = xmath.model_matrix(s.position, s.orientation, s.scale)
        view, proj = camera_matrices(s, cfg)
        mvp = model @ (view @ proj)
        return s, jnp.sum(mvp)

    for name, fn in (("identity", f_id), ("animate", f_anim),
                     ("matrices", f_mat)):
        ms = timed(fn, state)
        print(f"{name:>9}: {ms:7.2f} ms", flush=True)
    for name, fn in (("identity", f_id), ("animate", f_anim),
                     ("matrices", f_mat)):
        fresh = jax.device_put(jax.tree.map(jnp.array, state))
        ms = timed(fn, fresh, donate=True)
        print(f"{name:>9} (donated): {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()

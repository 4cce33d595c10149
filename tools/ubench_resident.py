"""Does closing over the static scene (resident geometry) kill the per-call
dispatch floor?  Compares arg-pytree step vs resident-scene step."""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.scene import XM_2PI
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    cfg = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    _, state, geo = build(cfg)

    # identity floor, small args: pass/return ONLY (time, orientation) + ck.
    @jax.jit
    def f_small(t, o):
        t = jnp.mod(t + cfg.yaw_per_frame, XM_2PI)
        o = o.at[:, 1].set(t)
        return t, o, jnp.sum(o)

    t, o = state.time, state.orientation
    t, o, ck = f_small(t, o)
    float(ck)
    t0 = time.time()
    for _ in range(50):
        t, o, ck = f_small(t, o)
    float(ck)
    print(f"small-arg identity: {(time.time() - t0) / 50 * 1e3:7.2f} ms",
          flush=True)

    # full resident frame: static scene closed over, step passes (t, o).
    @jax.jit
    def f_frame(t, o):
        t2 = jnp.mod(t + cfg.yaw_per_frame, XM_2PI)
        o2 = o.at[:, 1].set(t2)
        s = dataclasses.replace(state, time=t2, orientation=o2)
        frame = fr.render(s, cfg)
        return t2, o2, jnp.sum(frame.astype(jnp.uint32))

    t, o = state.time, state.orientation
    t, o, ck = f_frame(t, o)
    int(ck)
    t0 = time.time()
    for _ in range(30):
        t, o, ck = f_frame(t, o)
    int(ck)
    print(f"resident full frame: {(time.time() - t0) / 30 * 1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

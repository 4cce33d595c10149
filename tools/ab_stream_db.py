"""A/B the double-buffered stream-segment DMA (cfg.stream_dma_db) on-chip:
headline flagship config and config-4, db off vs on, ONE process with the
in-scan methodology (tools/profile_scan.timed_scan).

Usage: python tools/ab_stream_db.py [-n 30] [--w4k]
"""
from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.calibrate import autotune_shadow
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402
from profile_scan import timed_scan  # noqa: E402


def run_pair(name, cfg, state, n):
    import numpy as np

    frames = {}
    for db in (False, True):
        c = dataclasses.replace(cfg, stream_dma_db=db)

        def f_step(s, c=c):
            s2, frame = fr.step_frame(s, c)
            return s2, jnp.sum(frame.astype(jnp.uint32)).astype(jnp.float32)

        ms = timed_scan(f_step, state, n)
        frames[db] = np.asarray(jax.jit(
            lambda s, c=c: fr.step_frame(s, c)[1]
        )(state))
        print(f"{name} db={int(db)}: {ms:7.3f} ms", flush=True)
    diff = np.abs(frames[False].astype(int) - frames[True].astype(int))
    print(f"{name} parity: max u8 delta {diff.max()}", flush=True)
    assert diff.max() == 0, "db frame must be bit-identical"


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    n = 30
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])

    if "--w4k" in sys.argv:
        cfg = dataclasses.replace(
            dxr.FLAGSHIP_CONFIG, width=3840, height=2160, use_pallas=True,
            fused=True, animate_camera=True, max_live_lights_per_tile=512,
        )
        _, state, _ = build(cfg, n_lights=1024)
        run_pair("4k", cfg, state, n)
        return

    cfg_h = dxr.FLAGSHIP_CONFIG
    _, state, _ = build(cfg_h)
    run_pair("headline", cfg_h, state, n)

    cfg4 = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True,
        shadows=True, normal_mapping=True, bloom=True,
        max_lights_per_tile=128, shadow_vis_downsample=1,
        deferred_directional=True, inkernel_light_cull=True,
    )
    cfg4, srep = autotune_shadow(state, cfg4)
    print(f"shadow tiers {srep['tiers']} ({srep['sort_keys']} keys)", flush=True)
    run_pair("config4", cfg4, state, n)


if __name__ == "__main__":
    main()

"""A/B the config-4 mono-kernel block: what do bloom, bump, and the Mosaic
resolve each cost on-chip?  Times step_frame under flag variants in ONE
process with the in-scan methodology (tools/profile_scan.timed_scan).

Usage: python tools/ab_config4_parts.py [-n 30]
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


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    n = 30
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
    base = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True,
        shadows=True, normal_mapping=True, bloom=True,
        max_lights_per_tile=128,
        deferred_directional=True, inkernel_light_cull=True,
    )
    _, state, _ = build(base)
    base, srep = autotune_shadow(state, base)
    print(f"shadow tiers {srep['tiers']} ({srep['sort_keys']} keys)", flush=True)

    variants = [
        ("config4 full", {}),
        ("  -bloom", dict(bloom=False)),
        ("  -bump", dict(normal_mapping=False)),
        ("  -split (unsplit kernel)", dict(deferred_directional=False)),
        ("  xla resolve", dict(split_resolve_pallas=False)),
    ]
    for name, over in variants:
        cfg = dataclasses.replace(base, **over)

        def f_step(s, cfg=cfg):
            s2, frame = fr.step_frame(s, cfg)
            return s2, jnp.sum(frame.astype(jnp.uint32)).astype(jnp.float32)

        ms = timed_scan(f_step, state, n)
        print(f"{name:>28}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

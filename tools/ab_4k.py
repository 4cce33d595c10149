"""A/B: 4K binning/tiling levers (scan-timed, one dispatch per measurement).

The 4K stage scan (tools/profile_scan.py --w4k) attributes +4.3 ms of the
frame to binning: the area_scale=4 budget scaling (raster_pallas.py) inflates
the 1080p-tuned tier budgets x4, quadrupling the sort-key array — the sort IS
the binning cost.  Two levers, separately and together:

  - ``autotune``: calibrate.autotune run AT 4K on the flythrough orbit —
    budgets derived from the measured 4K footprint distribution instead of
    blindly scaling the 1080p-tuned ones x4.
  - ``th16``: tile_h=16 — halves the tile grid (270 -> 135 rows), so tile
    footprints (and emitted keys) roughly halve; the shadow pass already uses
    16-row tiles on square maps (measured ~10% faster there).

Each variant reports overflow (must be 0 for a valid number) and max u8 frame
delta vs the shipped config (binning-content changes must not change the
image; tiling changes only regroup per-pixel work).

Run: python tools/ab_4k.py [-n 20]
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
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def timed_scan(cfg, state, n):
    @jax.jit
    def run(s):
        def step(carry, _):
            s, acc = carry
            s2, frame = fr.step_frame(s, cfg)
            return (s2, acc + jnp.sum(frame.astype(jnp.uint32))), None

        (s2, acc), _ = jax.lax.scan(
            step, (s, jnp.uint32(0)), None, length=n
        )
        return s2, acc

    s2, acc = run(state)
    int(acc)
    t0 = time.time()
    s2, acc = run(state)
    int(acc)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    n = 20
    if "-n" in sys.argv:
        n = int(sys.argv[sys.argv.index("-n") + 1])

    cfg0 = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG, width=3840, height=2160, use_pallas=True,
        fused=True, animate_camera=True, max_live_lights_per_tile=512,
    )
    _, state, _ = build(cfg0, n_lights=1024)

    from d3d12_deferred_renderer_tpu.calibrate import autotune

    cfg_auto, rep = autotune(state, cfg0)
    print(
        f"4k autotune: ladder {rep['ladder']} budgets {rep['budgets']} "
        f"stream {rep['stream_cap']} keys {rep['sort_keys']} "
        f"lights/tile {rep['max_live_lights_per_tile']}", flush=True,
    )

    variants = [
        ("shipped (1080p budgets x area_scale)", cfg0),
        ("autotuned at 4k", cfg_auto),
        ("tile_h=16", dataclasses.replace(cfg0, tile_h=16)),
        ("tile_h=16 + autotuned", dataclasses.replace(cfg_auto, tile_h=16)),
    ]

    # The delta baseline is ONLY the shipped variant (variants[0]): if it
    # fails, later variants report "n/a" instead of silently promoting the
    # first survivor to baseline and printing a misleading 0 (round-4
    # advisor finding).
    ref_frame = None
    for i, (name, cfg) in enumerate(variants):
        try:
            frame, stats = jax.jit(fr.render_stats, static_argnums=(1,))(
                state, cfg
            )
            ovf = int(stats["overflow"])
            fnp = np.asarray(frame).astype(np.int32)
            if i == 0:
                ref_frame = fnp
                dmax = 0
            elif ref_frame is None:
                dmax = "n/a (shipped baseline failed)"
            else:
                dmax = int(np.abs(fnp - ref_frame).max())
            ms = timed_scan(cfg, state, n)
            print(
                f"{name:>36}: {ms:7.3f} ms/frame  {1e3 / ms:6.1f} FPS  "
                f"overflow={ovf}  max_u8_delta={dmax}", flush=True,
            )
        except Exception as e:  # VMEM overflow etc: report, keep going
            print(f"{name:>36}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()

"""A/B the in-kernel light cull (cfg.inkernel_light_cull) on-chip.

For the headline config (where the depth prepass + XLA tile cull + per-tile
id-list DMA all drop out of the frame) and the config-4 feature stack (where
the prepass stays for PCF visibility and only the cull/list work disappears),
measures checksum-forced step times with the flag OFF vs ON, asserts overflow
0 and frame parity within the accumulation-reassociation bounds, and prints
the deltas.  This is the measurement that decides whether FLAGSHIP_CONFIG
flips the flag on.
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import d3d12_deferred_renderer_tpu as dxr
import d3d12_deferred_renderer_tpu.frame as fr
from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

from bench import build  # noqa: E402


def measure(cfg, state, n=30):
    @jax.jit
    def step_ck(s, ovf):
        s2 = fr.animate(s, cfg.yaw_per_frame, cfg)
        frame, stats = fr.render_stats(s2, cfg)
        return (
            s2,
            jnp.sum(frame.astype(jnp.uint32)),
            jnp.maximum(ovf, stats["overflow"]),
        )

    ovf = jnp.zeros((), jnp.int32)
    s, ck, ovf = step_ck(state, ovf)
    int(ck)
    t0 = time.time()
    for _ in range(n):
        s, ck, ovf = step_ck(s, ovf)
    int(ck)
    dt = (time.time() - t0) / n
    assert int(ovf) == 0, f"overflow {int(ovf)} with cfg {cfg}"
    return dt


def parity(cfg_a, cfg_b, state):
    fa = jax.jit(fr.render, static_argnums=(1,))(state, cfg_a)
    fb = jax.jit(fr.render, static_argnums=(1,))(state, cfg_b)
    d = jnp.abs(fa.astype(jnp.int32) - fb.astype(jnp.int32)).max(axis=-1)
    mean_abs = float(jnp.mean(d))
    frac_gt4 = float(jnp.mean(d > 4))
    print(
        f"  parity: mean|d| {mean_abs:.4f} u8, frac>4LSB {frac_gt4:.5f}, "
        f"max {int(jnp.max(d))}"
    )
    assert mean_abs <= 1.0 and frac_gt4 <= 0.02, "in-kernel-cull parity blown"


def ab(name, cfg, n=30):
    _, state, _ = build(cfg)
    cfg_on = dataclasses.replace(cfg, inkernel_light_cull=True)
    t_off = measure(cfg, state, n)
    t_on = measure(cfg_on, state, n)
    print(
        f"{name}: inkernel_cull OFF {t_off*1e3:7.2f} ms  ON {t_on*1e3:7.2f} ms  "
        f"delta {(t_off-t_on)*1e3:+.2f} ms  ({1/t_off:.1f} -> {1/t_on:.1f} FPS)"
    )
    parity(cfg, cfg_on, state)


def main():
    from bench import tpu_responsive

    # A wedged tunnel hangs PJRT init forever; probe in a subprocess first so
    # this tool fails fast instead.
    if not tpu_responsive():
        raise SystemExit("TPU tunnel unresponsive — A/B needs the real chip")
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "A/B needs the real chip"
    head = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    ab("headline", head)
    cfg4 = dataclasses.replace(
        head, shadows=True, normal_mapping=True, bloom=True,
        max_lights_per_tile=128, shadow_vis_downsample=1,
    )
    ab("config-4", cfg4)


if __name__ == "__main__":
    main()

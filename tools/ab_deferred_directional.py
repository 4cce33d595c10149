"""A/B the deferred-directional split (cfg.deferred_directional) on-chip.

Config-4 (shadows + bump + bloom) measured with the shipped settings
(prepass-fed vis plane, prefetch-list cull) vs the split combined with the
in-kernel cull — the combination that deletes the depth prepass from the
shadow frame entirely (PCF visibility reads the kernel's own depth plane,
the cull runs in-kernel).  Prints checksum-forced step deltas, asserts
overflow 0 and frame parity.  This is the measurement that decides whether
the config-4 rows flip both flags on.
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
    assert mean_abs <= 1.0 and frac_gt4 <= 0.02, "split parity blown"


def main():
    from bench import tpu_responsive

    if not tpu_responsive():
        raise SystemExit("TPU tunnel unresponsive — A/B needs the real chip")
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "A/B needs the real chip"
    head = dataclasses.replace(dxr.FLAGSHIP_CONFIG, use_pallas=True, fused=True)
    cfg4 = dataclasses.replace(
        head, shadows=True, normal_mapping=True, bloom=True,
        max_lights_per_tile=128, shadow_vis_downsample=1,
        inkernel_light_cull=False,
    )
    _, state, _ = build(cfg4)
    cfg_on = dataclasses.replace(
        cfg4, deferred_directional=True, inkernel_light_cull=True
    )
    t_off = measure(cfg4, state)
    t_on = measure(cfg_on, state)
    print(
        f"config-4: split OFF {t_off*1e3:7.2f} ms  ON(+ik) {t_on*1e3:7.2f} ms  "
        f"delta {(t_off-t_on)*1e3:+.2f} ms  ({1/t_off:.1f} -> {1/t_on:.1f} FPS)"
    )
    parity(cfg4, cfg_on, state)
    # Same split+ik with the XLA resolve block (the round-3 configuration
    # that measured a wash) — isolates the Mosaic resolve kernel's
    # contribution.
    cfg_xla = dataclasses.replace(cfg_on, split_resolve_pallas=False)
    t_xla = measure(cfg_xla, state)
    print(
        f"config-4: split ON, XLA resolve {t_xla*1e3:7.2f} ms  "
        f"({1/t_xla:.1f} FPS)"
    )
    # Split WITHOUT ik (prepass stays for the XLA cull, vis still reads the
    # kernel depth) — isolates the two contributions.
    cfg_sp = dataclasses.replace(cfg4, deferred_directional=True)
    t_sp = measure(cfg_sp, state)
    print(f"config-4: split only {t_sp*1e3:7.2f} ms  ({1/t_sp:.1f} FPS)")
    parity(cfg4, cfg_sp, state)


if __name__ == "__main__":
    main()

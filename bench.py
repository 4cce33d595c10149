"""Benchmark harness: 1080p deferred frame, multi-mesh scene, 256 point lights,
per-tile light culling (BASELINE.json config 3) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is FPS / 60 — the reference publishes no numbers (BASELINE.md), so the
driver's >60 FPS target is the baseline.

Timing methodology: every timed step returns a 4-byte checksum that depends on
every frame byte, and the loop reads it each iteration — `block_until_ready` does
NOT force execution through remote-TPU transports, so only a data read gives real
times.  Light radius is sized so per-tile culled counts are realistic (~4-20
lights/tile): per-tile culling exists to exploit that sparsity, and the culling
structures report `overflow`, so no light is ever silently dropped.
"""
from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_RADIUS = 1.2


def tpu_responsive(timeout: float = 150.0, attempts: int = 2) -> bool:
    """Probe the tunneled TPU in a SUBPROCESS.  A wedged tunnel (stale remote
    lease after a killed client) blocks PJRT backend init forever — in-process
    there is no way to time that out, so the probe runs a trivial device op in
    a child (which inherits the same sitecustomize/axon platform) and gives up
    after `timeout`.  Returns False on hang or error; callers then force the
    CPU platform BEFORE any backend touch so the benchmark still emits its
    JSON line instead of hanging the driver.

    Retries once by default: a client that exited moments ago can hold the
    remote lease for a couple of minutes, during which a single probe times
    out even though the tunnel is healthy (observed: entry() smoke passed,
    bench launched right after saw its first probe hang, a manual probe two
    minutes later succeeded).  One retry distinguishes lease-release latency
    from a real wedge without unbounded waiting."""
    import subprocess
    import sys

    import time as _time

    for attempt in range(max(1, attempts)):
        try:
            p = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, jax.numpy as jnp; "
                    "x = jnp.ones((8, 128)); print(float((x @ x.T).sum()))",
                ],
                timeout=timeout,
                capture_output=True,
            )
            # A deterministic failure (import/platform error) cannot succeed
            # on retry — only a TIMEOUT is worth probing again.
            return p.returncode == 0
        except subprocess.TimeoutExpired:
            # Killing the timed-out probe cannot itself wedge the tunnel: a
            # probe that timed out was still BLOCKED in PJRT init waiting for
            # the remote lease (it never acquired one to go stale).  Give the
            # lease holder a moment to release before the next attempt.
            if attempt + 1 < max(1, attempts):
                _time.sleep(5.0)
    return False


def host_spin_ms(reps: int = 3) -> float:
    """Contention probe: best-of-`reps` wall time of a fixed pure-Python spin
    loop, in ms.  Host CPU contention (CLAUDE.md: a concurrently running test
    suite inflates host-loop timings 10-20%) slows this loop the same way it
    slows the timed dispatch loop, so the recorded JSON can carry a
    machine-load annotation — round 4's driver-recorded headline regressed 3%
    purely from contention, invisibly."""
    import time as _time

    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        x = 0
        for i in range(200_000):
            x += i
        best = min(best, _time.perf_counter() - t0)
    return best * 1e3


# host_spin_ms measured on this container with nothing else running
# (min of 3 over several quiet samples, 2026-08-21).  A loaded machine
# (e.g. the CPU test suite) measures 1.5-3x this.
QUIET_SPIN_MS = 11.0


def build(cfg, n_meshes=24, n_lights=256):
    import d3d12_deferred_renderer_tpu as dxr

    meshes = dxr.procedural.benchmark_meshes(n=n_meshes)
    geo = dxr.build_scene_geometry(meshes)
    lights = dxr.random_point_lights(n_lights, cfg=cfg, radius=LIGHT_RADIUS)
    state = dxr.make_scene(
        geo, cfg, lights=lights, placement="grid",
        materials=dxr.Materials.varied(geo.num_meshes),
    )
    return dxr, state, geo


def main():
    import d3d12_deferred_renderer_tpu as dxr
    import d3d12_deferred_renderer_tpu.frame as fr
    from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

    enable_compilation_cache()

    tpu_dead = False
    if "cpu" != (jax.config.jax_platforms or "").strip().lower():
        if not tpu_responsive():
            # Wedged tunnel: fall back to CPU (before any backend touch in
            # THIS process) rather than hanging with no output at all.
            jax.config.update("jax_platforms", "cpu")
            tpu_dead = True

    on_tpu = jax.default_backend() == "tpu"
    cfg = dataclasses.replace(
        dxr.FLAGSHIP_CONFIG,
        use_pallas=on_tpu,
        fused=on_tpu,  # fused tiled-deferred mono-kernel (G-buffer VMEM-only)
        # CPU fallback (no TPU available): tiny frame so the harness still runs.
        **({} if on_tpu else {"width": 256, "height": 144}),
    )
    dxr, state, geo = build(cfg, **({} if on_tpu else {"n_meshes": 2, "n_lights": 16}))

    @jax.jit
    def step_ck(s, yaw, ovf):
        s2 = fr.animate(s, yaw, cfg)
        frame, stats = fr.render_stats(s2, cfg)
        # Checksum forces real execution when read (see module docstring); the
        # carried overflow max covers EVERY timed frame — a scene that drops
        # work only at some yaw angles must still fail the gate below.
        return s2, jnp.sum(frame.astype(jnp.uint32)), jnp.maximum(ovf, stats["overflow"])

    yaw = jnp.float32(cfg.yaw_per_frame)
    # Warm up / compile.
    ovf = jnp.zeros((), jnp.int32)
    state, ck, ovf = step_ck(state, yaw, ovf)
    int(ck)

    # Full-orbit overflow sweep: the timed loop below covers ~0.3 rad of the
    # yaw orbit, but the capacity budgets (binning tiers, stream cap, shadow
    # tile cap, live-light cap) are claimed for the WHOLE orbit — stride 2*pi
    # in 64 steps through the SAME compiled program (yaw is a traced arg) so
    # the recorded overflow max certifies every yaw angle, then fold the max
    # into the gate.  The sweep chains through the state/ovf dependency; one
    # checksum read at the end forces it.
    if on_tpu:
        sweep_state = state
        for _ in range(64):
            sweep_state, ck, ovf = step_ck(
                sweep_state, jnp.float32(2.0 * np.pi / 64.0), ovf
            )
        int(ck)

    # Pipelined timing (the triple-buffering model): steps chain through the state
    # dependency so the device executes all N serially; the single final checksum
    # read forces the whole chain.  This excludes the host<->device round-trip per
    # frame (environment transport, not renderer work) but includes every byte of
    # every frame being computed.
    #
    # Contention guard (round-4 lesson: the driver-recorded headline was
    # captured under host load and regressed 3% vs a quiet machine): probe the
    # host with a spin loop; if loaded, give the machine a beat to drain; then
    # time the loop `passes` times and keep the best — every pass computes
    # every frame byte, so min is a legitimate estimator of renderer speed
    # with transient host stalls excluded.
    spin_ms = host_spin_ms()
    host_loaded = spin_ms > 1.4 * QUIET_SPIN_MS
    if host_loaded and on_tpu:
        time.sleep(10.0)
        spin_ms = host_spin_ms()
        host_loaded = spin_ms > 1.4 * QUIET_SPIN_MS
    n = 30 if on_tpu else 3
    passes = 3 if on_tpu else 1
    dt = float("inf")
    for _ in range(passes):
        t0 = time.time()
        for _ in range(n):
            state, ck, ovf = step_ck(state, yaw, ovf)
        int(ck)
        dt = min(dt, (time.time() - t0) / n)

    fps = 1.0 / dt
    mpix = cfg.width * cfg.height * fps / 1e6

    # No-silent-drop invariant: the per-tile binning/light caps report
    # overflow; the max over every warmup+timed frame is embedded in the JSON
    # line (a nonzero value means the FPS shaded dropped work) and folded into
    # the parity_ok gate below — the line still prints so the driver always
    # gets a result.
    overflow = int(ovf)

    # Compiled-path parity self-check on the SAME device/backend as the timing:
    # one small frame via the fused mono-kernel (all-Mosaic) vs the staged
    # pipeline (Mosaic raster + XLA lighting).  Bit-parity holds in interpret
    # mode (the test suite pins it); on-chip, Mosaic's FMA contraction and
    # transcendental implementations legitimately differ from XLA:TPU's by a
    # few ULPs, which flips rare edge-tie pixels and shifts bright speculars a
    # few u8 LSBs.  The gate is a REGRESSION tripwire, not an exactness claim:
    # a broken compile path (wrong coverage, collapsed shading) blows far past
    # these bounds, while the measured healthy divergence sits well inside.
    parity_ok = True
    parity_stats = None
    if on_tpu:
        # Two parity blocks so the gate covers EVERY Mosaic kernel variant the
        # flagship rows ship: the plain PBR mono-kernel, and the config-4
        # variants (in-kernel bump_planar, the shadow-visibility input plane,
        # linear-HDR output for the XLA bloom chain).
        parity_stats = {}
        for pname, extras in (
            ("pbr", {}),
            (
                "config4",
                # Shipped config-4 flags (round 4): deferred-directional split
                # + in-kernel cull + the Mosaic resolve kernel — measured
                # 14.87 -> 14.21 ms vs the round-3 flags
                # (tools/ab_deferred_directional.py, 2026-08-20).  The parity
                # block therefore covers the aux-plane kernel variant AND the
                # resolve kernel.
                {
                    "shadows": True, "normal_mapping": True, "bloom": True,
                    "deferred_directional": True, "inkernel_light_cull": True,
                },
            ),
        ):
            pcfg = dataclasses.replace(
                cfg, width=256, height=64, fused=True, use_pallas=True, **extras
            )
            _, pstate, _ = build(pcfg, n_meshes=4, n_lights=16)
            fused_frame = jax.jit(fr.render, static_argnums=(1,))(pstate, pcfg)
            scfg = dataclasses.replace(pcfg, fused=False)
            staged_frame = jax.jit(fr.render, static_argnums=(1,))(pstate, scfg)
            d = jnp.abs(
                fused_frame.astype(jnp.int32) - staged_frame.astype(jnp.int32)
            ).max(axis=-1)
            mean_abs = float(jnp.mean(d))
            frac_gt4 = float(jnp.mean(d > 4))
            parity_stats[pname] = {
                "mean_abs_u8": round(mean_abs, 3),
                "frac_gt_4lsb": round(frac_gt4, 4),
                "max_u8": int(jnp.max(d)),
            }
            parity_ok = parity_ok and mean_abs <= 1.0 and frac_gt4 <= 0.02
    # A headline measured while dropping triangles/lights is not a valid
    # result — surface it through the same gate the driver records.
    parity_ok = parity_ok and overflow == 0

    result = {
        "metric": "1080p_fps_256_lights" if on_tpu else "cpu_fallback_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
        "detail": {
            "resolution": f"{cfg.width}x{cfg.height}",
            "lights": state.lights.num_point,
            "light_radius": LIGHT_RADIUS,
            "triangles": geo.num_triangles,
            "ms_per_frame": round(dt * 1e3, 3),
            "mpix_shaded_per_sec": round(mpix, 1),
            "timing": "checksum-forced (every frame byte computed, no truncation)",
            "backend": jax.default_backend(),
            "tpu_unresponsive": tpu_dead,
            # Machine-load annotation: spin-loop probe vs the quiet-machine
            # reference.  host_loaded=true means concurrent host work likely
            # inflated the number (see CLAUDE.md) — compare BENCH.md's
            # quiet-machine rows before calling a regression.
            "host_spin_ms": round(spin_ms, 2),
            "host_loaded": host_loaded,
            # When the tunneled TPU is wedged the harness still emits a line
            # (CPU fallback) — point the reader at the last real-chip numbers
            # (BENCH.md reproduces them with this same harness).
            **(
                {
                    "last_tpu_measurement": {
                        "metric": "1080p_fps_256_lights",
                        "fps": 207.4,
                        "ms_per_frame": 4.822,
                        "measured": "2026-08-20",
                        "see": "BENCH.md",
                    }
                }
                if tpu_dead
                else {}
            ),
            "overflow": overflow,
            "parity_ok": parity_ok,
            "parity_stats": parity_stats,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

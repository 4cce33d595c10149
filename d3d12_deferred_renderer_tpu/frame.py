"""The frame program: one jitted function = one frame.

Where the reference records a command list per frame (clear -> geometry pass ->
barriers -> lighting pass -> barriers -> present, main.cpp:161-342), the TPU renderer
compiles the whole chain ONCE into a single XLA program: vertex transform ->
rasterize -> G-buffer encode -> (shadows) -> lighting -> post -> uint8.  Barriers are
structural (functional dataflow), command-list reuse is XLA's compiled executable,
and there are zero host syncs inside a frame.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .config import RendererConfig
from .ops import post
from .ops.gbuffer import GBuffer, encode_gbuffer
from .ops.lighting import shade_lambert, shade_pbr_tiled
from .ops.raster_ref import FragmentPlanes, rasterize_packed
from .ops.shadows import render_shadow_map, shadow_visibility
from .ops.transform import setup_frame_triangles
from .scene import SceneState, animate


def _rasterize(packed, cfg: RendererConfig, aabb=None) -> FragmentPlanes:
    """Rasterizer dispatch: Pallas tile-binned kernel on TPU, pure-XLA reference
    elsewhere (or when cfg.use_pallas is off)."""
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from .ops.raster_pallas import rasterize_binned

        return rasterize_binned(packed, aabb, cfg)
    return rasterize_packed(packed, cfg.height, cfg.width)


def _fused_eligible(cfg: RendererConfig, interpret: bool = False) -> bool:
    """The fused mono-kernel covers the full PBR path, including the config-4
    feature stack: shadows arrive as a visibility input plane (computed from
    the prepass depth), normal mapping runs in-kernel on tile-block
    derivatives (ops/bump.bump_planar), and bloom switches the kernel to
    linear-HDR output with the XLA post chain finishing outside.

    The single source of truth for fused-path eligibility — the sharded band
    renderer (parallel/sharded._render_band) gates on the SAME predicate with
    interpret=True off-TPU, so a config the fused kernel cannot handle falls
    back to the staged path on every chip count alike."""
    return (
        cfg.fused
        and cfg.use_pallas  # fused IS a Pallas program; honor the XLA fallback
        and cfg.shading == "pbr"
        and cfg.quantize_gbuffer
        and (jax.default_backend() == "tpu" or interpret)
    )


def render_stats(state: SceneState, cfg: RendererConfig):
    """Render one frame -> (uint8 [H, W, 3], stats) where stats carries the
    per-tile capacity ``overflow`` count (tiles that dropped triangles or
    lights because a K cap was exceeded).  Zero on every supported config; a
    runtime signal — never a silent drop — otherwise (VERDICT: the debug-layer
    philosophy of main.cpp:379-390)."""
    overflow = jnp.zeros((), jnp.int32)

    if cfg.supersample > 1:
        import dataclasses as _dc

        s = cfg.supersample
        hi_cfg = _dc.replace(
            cfg, width=cfg.width * s, height=cfg.height * s, supersample=1
        )
        hi, st = render_stats(state, hi_cfg)
        hi = hi.astype(jnp.float32)
        lo = hi.reshape(cfg.height, s, cfg.width, s, 3).mean(axis=(1, 3))
        return jnp.round(lo).astype(jnp.uint8), st

    if _fused_eligible(cfg):
        from .ops.fused import render_fused

        # FXAA runs inside render_fused (pre-quantization, the staged slot).
        frame, overflow = render_fused(state, cfg, return_overflow=True)
        return frame, {"overflow": overflow}

    tris, view_proj = setup_frame_triangles(state, cfg)
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from .ops.raster_pallas import rasterize_binned

        frags, overflow = rasterize_binned(
            tris.packed, tris.aabb, cfg, return_overflow=True
        )
    else:
        frags = rasterize_packed(tris.packed, cfg.height, cfg.width)
    if cfg.normal_mapping:
        from .ops.bump import apply_normal_mapping
        from .ops.lighting import reconstruct_world_positions

        world = reconstruct_world_positions(frags.depth, view_proj, cfg)
        frags = apply_normal_mapping(
            frags, world, cfg, cfg.bump_strength, cfg.bump_frequency,
            view_proj=view_proj,
        )
    gb = encode_gbuffer(frags, state.materials, cfg)

    if cfg.shading == "lambert":
        color = shade_lambert(gb, state.lights, cfg)
        if cfg.fxaa:
            color = post.fxaa(color)
    else:
        vis = None
        if cfg.shadows:
            shadow_depth, light_vp, s_overflow = render_shadow_map(
                state, cfg, return_overflow=True
            )
            vis, v_overflow = shadow_visibility(
                gb.depth, view_proj, shadow_depth, light_vp, cfg,
                return_overflow=True,
            )
            overflow = overflow + s_overflow + v_overflow
        if cfg.use_pallas and jax.default_backend() == "tpu":
            # Pallas deferred-lighting kernel (the fused kernel's shading body
            # over G-buffer planes) — the pure-XLA tiled shading scans every
            # light SLOT per tile and is ~20x slower on chip.
            from .ops.lighting_pallas import shade_pbr_tiled_pallas

            hdr, l_overflow = shade_pbr_tiled_pallas(
                gb, state.lights, cfg, view_proj, state.camera.eye,
                shadow_visibility=vis, return_overflow=True,
            )
        else:
            hdr, l_overflow = shade_pbr_tiled(
                gb, state.lights, cfg, view_proj, state.camera.eye,
                shadow_visibility=vis, return_overflow=True,
            )
        overflow = overflow + l_overflow
        color = post.apply_post(hdr, cfg)

    return post.to_uint8(color), {"overflow": overflow}


_DEBUG_PRINT_OK: bool | None = None


def _debug_print_supported() -> bool:
    """Some PJRT transports (this container's tunneled `axon` platform) have no
    host callback channel, so jax.debug.print aborts the program at RUN time.
    Probe once per process with a trivial jitted print."""
    global _DEBUG_PRINT_OK
    if _DEBUG_PRINT_OK is None:
        # Do NOT probe by running a print: a failed callback setup poisons the
        # PJRT client and every later execution reports the same error.  The
        # callback-less transport in this environment is the `axon` platform —
        # detect it from the configured platform list.
        plats = jax.config.jax_platforms or ""
        _DEBUG_PRINT_OK = "axon" not in plats
    return _DEBUG_PRINT_OK


def _warn_overflow(overflow):
    """Device-side overflow tripwire: prints (once per offending frame) when a
    tile dropped geometry/lights — the debug-layer analog of a D3D12 warning.
    On transports without host callbacks the in-program print is unavailable;
    callers that need a hard signal use render_stats() and assert (bench.py,
    tools/demo.py both do)."""
    if not _debug_print_supported():
        return

    def warn():
        jax.debug.print(
            "[renderer] WARNING: per-tile capacity overflow on {n} tiles — "
            "triangles or lights were dropped this frame; raise "
            "max_tris_per_tile / max_lights_per_tile / bin_max_big.",
            n=overflow,
        )
        return 0

    jax.lax.cond(overflow > 0, warn, lambda: 0)


def render(state: SceneState, cfg: RendererConfig) -> jnp.ndarray:
    """Render one frame from scene state -> display-ready uint8 [H, W, 3].

    Emits a runtime warning print if any per-tile capacity overflowed (see
    render_stats for programmatic access to the count)."""
    frame, stats = render_stats(state, cfg)
    if cfg.overflow_warn:
        _warn_overflow(stats["overflow"])
    return frame


def render_gbuffer(state: SceneState, cfg: RendererConfig) -> GBuffer:
    """Geometry pass only (for tests/tools): G-buffer with format quantization."""
    tris, _ = setup_frame_triangles(state, cfg)
    frags = _rasterize(tris.packed, cfg, tris.aabb)
    return encode_gbuffer(frags, state.materials, cfg)


def step_frame(
    state: SceneState, cfg: RendererConfig
) -> Tuple[SceneState, jnp.ndarray]:
    """One iteration of the reference's while-loop (main.cpp:161-342): advance the
    animation clock, render.  Jit this (static cfg) and loop on the host."""
    state = animate(state, cfg.yaw_per_frame, cfg)
    return state, render(state, cfg)


@functools.partial(jax.jit, static_argnums=(1,))
def step_frame_jit(state: SceneState, cfg: RendererConfig):
    return step_frame(state, cfg)


def render_batch(state: SceneState, cfg: RendererConfig, num_frames: int):
    """Render `num_frames` consecutive animated frames in ONE jitted program
    (BASELINE config 5 stretch: batch frames per jit step).  Returns
    (final_state, frames [N, H, W, 3] uint8)."""

    def body(st, _):
        st, frame = step_frame(st, cfg)
        return st, frame

    return jax.lax.scan(body, state, None, length=num_frames)

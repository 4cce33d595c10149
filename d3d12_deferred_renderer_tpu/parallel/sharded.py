"""Multi-chip rendering: screen-row bands x frame batches over a device mesh.

Strategy (SURVEY.md §5 "distributed communication backend"): rendering is data
parallel over pixels — scene state is replicated (it is small), every chip runs
vertex transform + binning for its own screen band, rasterizes and shades only that
band, and the G-buffer NEVER crosses chips.  The only cross-chip data movement is
the implicit assembly of the final uint8 frame (out_specs concatenation over ICI).
A second mesh axis batches whole frames (BASELINE config 5: 8 frames per jit step).

All functions run under shard_map with static RendererConfig, so XLA compiles one
SPMD program; `dryrun_multichip` in __graft_entry__.py validates this on a virtual
CPU mesh.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RendererConfig
from ..ops import post
from ..ops.gbuffer import encode_gbuffer
from ..ops.lighting import shade_lambert, shade_pbr_tiled
from ..ops.raster_ref import rasterize_packed
from ..ops.transform import setup_frame_triangles
from ..scene import SceneState
from ..xmath import XM_2PI


def _render_band(
    state: SceneState, cfg: RendererConfig, y0, band_h: int,
    pallas_interpret: bool = False,
):
    """Render rows [y0, y0 + band_h) of the full cfg.height x cfg.width frame.
    `y0` may be traced (axis_index * band)."""
    W = cfg.width
    tris, view_proj = setup_frame_triangles(state, cfg)

    if cfg.use_pallas and (jax.default_backend() == "tpu" or pallas_interpret):
        from ..ops.raster_pallas import rasterize_binned

        frags = rasterize_binned(
            tris.packed, tris.aabb, cfg, interpret=pallas_interpret,
            band_h=band_h, y_offset=y0,
        )
    else:
        ys = jnp.asarray(y0, jnp.float32) + 0.5 + jnp.arange(band_h, dtype=jnp.float32)
        xs = jnp.arange(W, dtype=jnp.float32) + 0.5
        py, px = jnp.meshgrid(ys, xs, indexing="ij")
        frags = rasterize_packed(tris.packed, band_h, W, px=px, py=py)
    gb = encode_gbuffer(frags, state.materials, cfg)

    if cfg.shading == "lambert":
        color = shade_lambert(gb, state.lights, cfg)
    else:
        vis = None
        if cfg.shadows:
            # The shadow map is view-global and band-independent: every chip
            # renders it replicated (it is small) and samples its own band.
            from ..ops.shadows import render_shadow_map, shadow_visibility

            shadow_depth, light_vp = render_shadow_map(state, cfg)
            vis = shadow_visibility(
                gb.depth, view_proj, shadow_depth, light_vp, cfg,
                y_offset=y0, full_height=cfg.height,
            )
        # The light-culling tile must divide the band height and the width.
        tile = math.gcd(32, band_h, W)
        hdr = shade_pbr_tiled(
            gb, state.lights, cfg, view_proj, state.camera.eye, tile=tile,
            shadow_visibility=vis, y_offset=y0, full_height=cfg.height,
        )
        color = post.apply_post(hdr, cfg)
    return post.to_uint8(color)


def _check_band_safe(cfg: RendererConfig) -> None:
    """Flags whose image-space filters read across band boundaries would
    produce seams if computed per band — refuse loudly instead of diverging
    silently from the single-chip render() (round-1 advisor finding)."""
    bad = [
        name
        for name, on in (
            ("bloom", cfg.bloom),
            ("fxaa", cfg.fxaa),
            ("normal_mapping", cfg.normal_mapping),
        )
        if on
    ]
    if bad:
        raise ValueError(
            f"screen-sharded rendering does not support {bad}: these use "
            "cross-pixel filters that would seam at band boundaries; render "
            "single-chip or shard over the frame axis instead"
        )


def render_sharded(
    state: SceneState, cfg: RendererConfig, mesh: Mesh, rows_axis: str = "rows",
    pallas_interpret: bool = False,
) -> jnp.ndarray:
    """One frame, screen rows sharded across `rows_axis` -> [H, W, 3] uint8
    (device-sharded along rows)."""
    _check_band_safe(cfg)
    n = mesh.shape[rows_axis]
    if cfg.height % n:
        raise ValueError(f"height {cfg.height} not divisible by {n} bands")
    band = cfg.height // n

    def fn(st):
        y0 = jax.lax.axis_index(rows_axis) * band
        return _render_band(st, cfg, y0, band, pallas_interpret)

    return jax.shard_map(
        fn, mesh=mesh, in_specs=P(), out_specs=P(rows_axis, None, None),
        check_vma=False,
    )(state)


def _with_time(state: SceneState, t) -> SceneState:
    """Set the animation clock to t (yaw of every mesh = t, main.cpp:200-207)."""
    return dataclasses.replace(
        state, time=t, orientation=state.orientation.at[:, 1].set(t)
    )


def render_frames_batch_sharded(
    state: SceneState,
    times: jnp.ndarray,
    cfg: RendererConfig,
    mesh: Mesh,
    frame_axis: str = "frame",
    rows_axis: str = "rows",
) -> jnp.ndarray:
    """Batch of frames at animation clocks `times` [B] -> [B, H, W, 3] uint8,
    sharded (frames over `frame_axis`) x (rows over `rows_axis`)."""
    _check_band_safe(cfg)
    nf, nr = mesh.shape[frame_axis], mesh.shape[rows_axis]
    B = times.shape[0]
    if B % nf or cfg.height % nr:
        raise ValueError("batch/height not divisible by mesh axes")
    band = cfg.height // nr

    def fn(st, ts):  # ts: local [B // nf]
        y0 = jax.lax.axis_index(rows_axis) * band
        return jax.vmap(lambda t: _render_band(_with_time(st, t), cfg, y0, band))(ts)

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(frame_axis)),
        out_specs=P(frame_axis, rows_axis, None, None),
        check_vma=False,
    )(state, times)


def animation_times(start_time: float, num_frames: int, yaw_per_frame: float = 0.01):
    """The reference's animation clock for `num_frames` consecutive frames."""
    t = start_time + yaw_per_frame * (1 + jnp.arange(num_frames, dtype=jnp.float32))
    return jnp.mod(t, XM_2PI)

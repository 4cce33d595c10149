"""RendererConfig — the complete flag surface of the renderer.

The reference has no config system (SURVEY.md §5): every knob is a compile-time
constant in source/main.cpp or hardcoded in the HLSL.  This dataclass exposes each of
those constants with the reference value as its default, plus the knobs the TPU build
adds on top (PBR, light culling, post chain, tiling, batching).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

from .xmath import XM_PIDIV4


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    # --- Window / framebuffer (main.cpp:78-79) ---
    width: int = 1280
    height: int = 720

    # --- Presentation (main.cpp:84, 167-171) ---
    frames_in_flight: int = 3  # triple buffering

    # --- Camera (main.cpp:214-224) ---
    eye: Tuple[float, float, float] = (0.0, 1.0, -8.0)
    at: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov_y: float = XM_PIDIV4
    z_near: float = 0.1
    z_far: float = 100.0

    # --- Animation (main.cpp:201-207): yaw advances 0.01 rad per frame, mod 2pi ---
    yaw_per_frame: float = 0.01

    # --- Directional light (main.cpp:245-247) ---
    light_direction: Tuple[float, float, float] = (-0.3, -0.2, -1.0)
    light_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)

    # --- Material constants (geometry.hlsl:46-49) ---
    albedo: Tuple[float, float, float] = (0.8, 0.2, 0.2)
    metalness: float = 0.0
    roughness: float = 0.5

    # --- Lighting constants (lighting.hlsl:45, 37, 48) ---
    ambient: float = 0.3
    gamma: float = 2.2

    # --- G-buffer quantization parity (main.cpp:476, 485, 509) ---
    # GB0 is RGBA8_UNORM, GB1 is R10G10B10A2_UNORM, depth D32_FLOAT.  When True the
    # G-buffer is quantized exactly like the reference formats between the passes.
    quantize_gbuffer: bool = True

    # --- Background: the reference clears the backbuffer to cornflower blue
    # (main.cpp:294-297) but the fullscreen lighting triangle then overwrites every
    # pixel (DrawInstanced(3,...), no depth test, no blending, main.cpp:307), shading
    # the cleared-to-zero G-buffer to black.  Parity therefore means "shade every
    # pixel"; the clear color is preserved here only for documentation. ---
    clear_color: Tuple[float, float, float] = (0.39, 0.58, 0.93)

    # --- Shading model: "lambert" is reference parity (lighting.hlsl:32-51);
    # "pbr" is Cook-Torrance GGX over the same G-buffer (BASELINE configs 2-3). ---
    shading: str = "lambert"

    # --- Tonemap applied in pbr mode before gamma ("none" | "reinhard") ---
    tonemap: str = "reinhard"

    # --- Post chain (BASELINE config 4) ---
    bloom: bool = False
    bloom_threshold: float = 1.0
    bloom_strength: float = 0.15
    fxaa: bool = False

    # --- Shadow mapping (BASELINE config 4): directional-light ortho shadow map ---
    shadows: bool = False
    shadow_map_size: int = 1024
    # Shadow-visibility sampling rate divisor: 1 = compare at every pixel
    # (exact); d > 1 compares at every d-th pixel and bilinearly upsamples the
    # visibility (softer penumbra edges).  Per-pixel gathers from the shadow
    # map cost ~11 ns each on TPU (~92 ms/frame at 1080p x 4 PCF taps), so the
    # TPU showcase config trades edge sharpness for rate here.
    shadow_vis_downsample: int = 1

    # Sparse PCF tile cap: shadow visibility samples only screen tiles that
    # contain geometry (background tiles shade to black regardless), compacted
    # to at most this many (8, 128) tiles.  -1 = auto (3/4 of the tile grid),
    # 0 = disable (always dense).  Covered tiles beyond the cap are dropped
    # with a LOUD overflow count (no silent drop), like the binning caps.
    # Default is DENSE: the win is scene-dependent (geometry coverage), and a
    # scene covering more tiles than the cap would lose shadows (loudly).
    # FLAGSHIP_CONFIG opts in (the benchmark scene covers ~53% of tiles).
    shadow_tiles_cap: int = 0

    # Sparse-PCF tile cap when a lit-facing mask prunes the compaction (the
    # fused deferred-directional split passes lit_mask — shadows.py): tiles
    # with no NdotL>0 geometry pixel never consume vis, so the LIT-pruned
    # covered count is all the cap must hold, and the PCF gather count scales
    # with the STATIC cap.  0 = inherit shadow_tiles_cap (the safe default,
    # sized for the unpruned covered count); negative = auto, 3/4 of the tile
    # grid, exactly like a negative shadow_tiles_cap.  Only consulted when a
    # lit mask is actually supplied; covered-lit tiles beyond it drop shadows
    # LOUDLY via the same overflow counter.
    shadow_tiles_cap_lit: int = 0

    # Window-gather PCF (sparse path only): gather ONE 4x4-texel window row
    # per 2x2 pixel quad instead of one 2x2-footprint row per pixel — ~4x
    # fewer shadow-map gathers.  BIT-exact: quads whose four bilinear
    # footprints don't fit a 4x4 window (depth edges, grazing angles) fall
    # back to per-pixel taps from the same packed table (lanes of the pixel's
    # own window), compacted to shadow_bad_quads_cap entries; more bad quads
    # than the cap raises the LOUD overflow counter (never a silent drop).
    # -1 = auto (1/8 of the sparse pixel budget).
    #
    # OFF by default: measured on-chip (2026-08-19, BENCH.md "tried and
    # rejected") the gather savings never materialize — the wide-quad fallback
    # at the safe auto cap costs +4.8 ms on config 4 (22.9 vs 18.1 ms), and a
    # cap tight enough to be cheap (<=4096) both overflows on the benchmark
    # scene and only reaches PARITY with the per-pixel quad path (the 64-byte
    # window rows gather ~half as fast per row as the 32-byte quad rows, and
    # the 9-case lane-select adds VPU work the saved gathers just pay for).
    shadow_window_gather: bool = False
    shadow_bad_quads_cap: int = -1

    # Light-view binning tiers for the shadow-map pass, as
    # (bin_expand, bin_expand_medium, bin_max_medium, bin_expand_large,
    #  bin_max_large, bin_max_big, bin_max_small).  None = the safe
    # default (ops/shadows.py restores at least default-config headroom per
    # tier — wide, never narrowed by camera-tuned display budgets, but its
    # sort-key array is ~2x what the light view's measured footprint
    # distribution needs).  calibrate.autotune_shadow derives a tuned tuple
    # from the scene's light-view occupancy over the animation orbit; every
    # tier still overflows LOUDLY at runtime.
    shadow_bin_tiers: Tuple[int, int, int, int, int, int, int] | None = None

    # --- Procedural normal mapping (BASELINE config 4; the reference has no
    # textures, so the height field is analytic — see ops/bump.py) ---
    normal_mapping: bool = False
    bump_strength: float = 0.35
    bump_frequency: float = 24.0

    # --- Supersampled antialiasing: render at N x resolution, box-filter down.
    # The reference has MSAA off (SampleDesc {1,0}, main.cpp:767); SSAA is the
    # renderer-agnostic quality knob on top. ---
    supersample: int = 1

    # --- Camera flythrough (BASELINE config 5): orbit the camera with the
    # animation clock instead of the fixed reference camera ---
    animate_camera: bool = False
    orbit_radius: float = 8.0
    orbit_height: float = 2.5
    # Whole revolutions per animation-clock cycle (rounded at use, min 1):
    # the clock wraps at 2*pi (reference quirk), so a fractional rate would
    # teleport the orbiting camera at every wrap (scene.animate).
    orbit_speed: float = 1.0

    # --- Rasterizer / TPU tiling knobs ---
    tile_h: int = 8     # screen tile height (VPU sublane multiple)
    tile_w: int = 128   # screen tile width (VPU lane width)
    max_tris_per_tile: int = 256  # binning cap per tile (K)
    # Sort-based binning (large scenes): four expansion tiers sized so the
    # sort-key array stays small (its sort is the binning cost).  Triangles
    # covering <= bin_expand tiles emit that many (tile, tri) keys from a
    # dense [T, bin_expand] expansion; up to bin_max_medium triangles covering
    # <= bin_expand_medium tiles emit from a compacted [max_medium, medium]
    # expansion; likewise up to bin_max_large triangles covering
    # <= bin_expand_large tiles; up to bin_max_big still-larger triangles
    # expand against the full tile grid (the grid-wide [B, NT] tier is by far
    # the widest per-triangle emission — at 1080p it was over half of all sort
    # keys before the large tier split it off, for a handful of triangles).
    # Exceeding a tier budget is reported via the loud binning overflow
    # counter.
    bin_expand: int = 4
    bin_expand_medium: int = 32
    bin_max_medium: int = 512
    bin_expand_large: int = 256
    bin_max_large: int = 64
    bin_max_big: int = 16
    # Small-tier compaction budget: at most this many triangles route through
    # the [budget, bin_expand] small-rect expansion (ALL tiers are compacted by
    # one record sort; the budget bounds the emitted key count).  -1 = every
    # record (never overflows, but dead records — backface-culled triangles and
    # unused near-clip slots, ~75% on the benchmark scene — pad the sort).
    # Exceeding a positive budget drops triangles LOUDLY via the overflow
    # counter, like every other binning cap.
    bin_max_small: int = -1
    # Compacted record-stream capacity (rows = binned (tile, tri) pairs rounded
    # up to chunk alignment per tile).  The Pallas kernels DMA per-step segment
    # spans of this stream instead of a dense [tiles, K] block that is mostly
    # padding; exceeding the cap clamps tail tiles and reports overflow.
    bin_stream_cap: int = 65536
    # Double-buffered stream-segment DMA (raster_pallas._copy_group_segment_db):
    # each grid step prefetches the NEXT step's record-stream segment into the
    # other half of a doubled VMEM scratch and waits only on its own half
    # (started one step earlier), hiding the per-step segment copy behind the
    # raster/shade body instead of stalling on it.  Output is bit-identical by
    # construction (same rows, same fetch offsets); VMEM scratch cost doubles
    # (the flagship 1080p group spans ~3.9 MB -> ~7.9 MB of the ~16 MB budget).
    stream_dma_db: bool = False
    # Per-tile light-list length for the FUSED kernel's per-tile lists (the
    # exact depth-aware cull keeps ~1-20 lights/tile; the list DMA cost scales
    # with this).  Overflow is reported loudly if a tile exceeds it.
    max_live_lights_per_tile: int = 48
    max_lights_per_tile: int = 64  # light-culling cap per tile
    # Runtime overflow signal (debug-layer philosophy, main.cpp:379-390): when a
    # tile's triangle or light list exceeds its cap the excess is dropped; with
    # this flag the frame program emits a device-side warning print whenever
    # that happens instead of failing silently.  render_stats() exposes the
    # overflow count for callers that want to assert/raise.
    overflow_warn: bool = True
    use_pallas: bool = True  # Pallas kernels on TPU; pure-XLA fallback otherwise
    # Fused tiled-deferred mono-kernel (ops/fused.py): raster + G-buffer +
    # lighting + tonemap in one Pallas program, G-buffer VMEM-only.  Covers the
    # full PBR feature stack including config 4 (shadows enter as a visibility
    # input plane, normal mapping runs in-kernel, bloom flips the kernel to
    # linear-HDR output); requires use_pallas and the TPU backend, staged
    # pipeline otherwise (frame.py:_fused_eligible).
    fused: bool = False
    # Fused Pallas triangle-setup kernel (ops/setup_pallas.py): the whole
    # primitive-setup front end (transform + near clip + cull + record packing)
    # as ONE kernel launch instead of ~a hundred small XLA fusions.  Equal to
    # the XLA setup up to FMA-contraction rounding (~ULPs; tolerance-pinned by
    # tests — see the module docstring, NOT bit-identical); requires the
    # host-pre-expanded fv column buffers and the TPU backend (XLA setup
    # otherwise).  Measured on-chip (tools/ab_setup_kernel.py, 2026-08-19):
    # headline 7.83 -> 7.00 ms, config-4 18.72 -> 17.71 ms, final frames
    # bit-identical (max u8 delta 0) — FLAGSHIP_CONFIG turns it on; the
    # reference-parity default stays off (the XLA setup is the semantics
    # oracle the tests compare against).
    setup_pallas: bool = False
    # In-kernel light culling (fused path): instead of a depth-only Pallas
    # prepass feeding the XLA tile cull (whose per-tile id lists the kernel
    # DMAs), the mono-kernel culls every point light against each sub-tile's
    # EXACT world-space pixel bounds — two eye-distance slabs over the world
    # positions it already reconstructed from its own rastered depth — then
    # compacts the live ids in VMEM (ascending id order, same as the XLA
    # lists) and runs the unchanged chunked-sublane light loop.  Culling is
    # exact-conservative either way (a pixel within a light's radius lies in
    # its slab's AABB, and the falloff window is zero at the radius), so the
    # image matches the prepass path within the usual sub-LSB accumulation
    # reassociation.  On no-shadow configs this deletes the depth prepass +
    # XLA cull + per-tile list DMA from the frame; with shadows the prepass
    # stays (PCF visibility needs it) and only the cull/list work disappears.
    # Live lights beyond max_live_lights_per_tile raise the LOUD overflow
    # counter, never a silent drop (the in-kernel bounds are tighter than the
    # prepass slab corners, so a cap that holds for the XLA cull holds here).
    inkernel_light_cull: bool = False
    # Deferred-directional split (fused path, shadows on): the mono-kernel
    # skips the directional term and emits its depth / decoded-normal / mesh-id
    # planes alongside the local HDR; XLA then computes PCF visibility from
    # the KERNEL's depth plane (bit-identical to the prepass depth — pinned
    # invariant) and adds vis * directional-GGX using the staged path's
    # lighting code over the kernel's own G-buffer planes.  This breaks the
    # vis -> prepass dependency: combined with inkernel_light_cull the
    # depth-only prepass leaves the shadow frame entirely (nothing consumes
    # it), trading ~2 ms of prepass + cull for ~0.2 ms of extra plane IO.
    # The directional term reassociates from first to last in the radiance
    # sum (sub-LSB); parity tests bound the split against the unsplit fused
    # path and the staged oracle at <= 1 u8 LSB in interpret mode.
    #
    # OFF by default: measured on-chip (tools/ab_deferred_directional.py,
    # 2026-08-19) the XLA directional pass costs what the deleted prepass +
    # cull save — config-4 16.41 ms unsplit vs 16.43 ms split+ik (wash), and
    # split WITHOUT the in-kernel cull is strictly worse (17.42 ms: the
    # prepass stays for the XLA cull, so only vis moves while the full-screen
    # XLA GGX is added).  Kept as a working, tested path: on hardware where
    # elementwise XLA is relatively cheaper than Pallas launches the
    # trade-off flips.
    deferred_directional: bool = False
    # Deferred-directional resolve in Mosaic (split path only): the
    # vis * directional-GGX add over the kernel's emitted planes runs as a
    # per-tile-row Pallas kernel (fused.directional_resolve_pallas) instead of
    # the full-screen XLA pass whose ~1.8 ms at 1080p made the round-3 split a
    # wash.  The XLA block remains the oracle (CPU path, and the comparison
    # target in tests); flag only matters when deferred_directional is on.
    split_resolve_pallas: bool = True

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)


# Reference-parity default (config 1 of BASELINE.json).
REFERENCE_CONFIG = RendererConfig()

# BASELINE.json config 3: 1080p, 256 point lights, PBR with per-tile light culling.
# K=512 keeps every tile of the benchmark scene under the binning cap (overflow 0),
# and the light cap equals the light count so culling can NEVER drop a
# contributing light (the benchmark's light density exceeds 64/tile even with
# depth-aware culling — a smaller cap silently under-shades).
#
# Every scene-dependent budget below is reproducible from calibrate.autotune:
# tools/flagship_autotune.py (2026-08-21, on-chip) derives the SAME tier
# ladder and budgets within margin philosophy (the tool applies a blanket 30%
# where these carry measured 8-24%), and every shipped cap exceeds the tool's
# measured orbit maxima (tile max 414, pairs 26,535, covered 1,068, lights
# 114).  The shipped values win the same-process A/B (206.4 vs 202.2 FPS
# headline, 72.0 vs 67.0 config-4) — see BENCH.md "Flagship budgets vs
# calibrate.autotune".
FLAGSHIP_CONFIG = dataclasses.replace(
    REFERENCE_CONFIG,
    width=1920,
    height=1080,
    shading="pbr",
    max_tris_per_tile=512,
    max_lights_per_tile=256,
    # Exact culling keeps many live lights on far-plane tiles (their world
    # AABBs are huge): 48 overflowed 16 tiles, 96 still overflowed 2; 128 is
    # verified overflow-free on the benchmark scene.
    max_live_lights_per_tile=128,
    # Binning tiers tuned to the benchmark scene's measured footprint
    # distribution over the full yaw orbit (2026-08-19, 24 samples): live
    # records max 11,215 of 47,812 (backface cull + unused clip slots), fp<=2
    # max 9,224, fp in 3..8 max 1,957, fp in 9..64 max 36, fp>64 max 5.
    # Budgets carry ~30%+ margin; total sort keys drop ~3.5x (256k -> 74k)
    # vs the untuned tiers, and the stream cap covers the measured max 26,429
    # binned pairs with ~24% margin.  Every budget overflows LOUDLY.
    bin_expand=2,
    bin_expand_medium=8,
    bin_max_medium=3072,
    bin_expand_large=64,
    bin_max_large=128,
    bin_max_big=8,
    bin_max_small=12288,
    bin_stream_cap=32768,
    # Sparse PCF (sample only geometry-covered tiles): the PCF gather count
    # scales with the STATIC cap, not the covered count, so a tight cap is
    # worth real milliseconds.  Measured over the full 2*pi yaw orbit
    # (40 samples, 2026-08-19): covered tiles max 1070 / 2025, mean 1062; the
    # fused split additionally prunes lit-facing-empty tiles (max 1003 lit,
    # tools/lit_tiles.py, 2026-08-20).  1160 covers the UNPRUNED max (the
    # staged path takes no lit mask) with ~8% margin and stays a multiple
    # of 8.  A scene/viewpoint exceeding it drops shadows LOUDLY via the
    # overflow counter, and bench's full-orbit sweep gates on it.
    shadow_tiles_cap=1160,
    # Lit-pruned cap for the fused split (the shipped config-4 path): the
    # lit-facing prune's orbit max is 1003 tiles (tools/lit_tiles.py,
    # 16-sample full-orbit sweep, mean 995, spread 982-1003); 1104 carries
    # 10% margin, stays a multiple of 8, and cuts the static PCF gather
    # count ~5% vs the unpruned 1160.  Paths without a lit mask (staged)
    # keep using shadow_tiles_cap; overflow stays loud either way.
    shadow_tiles_cap_lit=1104,
    # Fused Pallas triangle setup: measured 0.8-1.0 ms faster per frame with
    # bit-identical output (see the flag's docstring above).
    setup_pallas=True,
    # In-kernel light culling: measured 6.93 -> 5.80 ms on the headline
    # (tools/ab_inkernel_cull.py, 2026-08-19) — the depth prepass, the XLA
    # tile cull, and the per-tile id-list DMA all drop out of the no-shadow
    # frame.  WITH shadows it measured a 0.25 ms wash (the prepass stays for
    # PCF visibility, so only the cull/list work disappears while the kernel
    # gains the cull itself) — shadow configs derived from this one should
    # flip it back off (bench/tools do).
    inkernel_light_cull=True,
    # Double-buffered stream-segment DMA: measured on-chip
    # (tools/ab_stream_db.py, 2026-08-20, same-process A/B) headline
    # 5.970 -> 5.805 ms and config-4 14.472 -> 14.331 ms, frames BIT-identical
    # (max u8 delta 0) on both — the next step's segment copy rides under the
    # current step's raster/shade body.  VMEM scratch doubles (~3.9 -> ~7.9 MB
    # at this config), still well inside the ~16 MB budget.
    stream_dma_db=True,
)

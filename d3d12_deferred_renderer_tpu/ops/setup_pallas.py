"""Pallas fused triangle setup — the whole primitive-setup front end in ONE kernel.

The XLA stacked-column setup (ops/transform.py:_setup_cols + _fv_transform_cols)
is already layout-optimal, but it compiles to ~a hundred small fusions whose
fixed per-launch overhead dominates at 24k triangles (~2.5 ms of the measured
headline frame, BENCH.md stage breakdown) — the arithmetic itself is trivial.
This module runs the identical math (transform -> near clip -> cull/viewport ->
record packing, same ops in the same order) as one Pallas program over the
triangle axis.

NUMERICS: identical expressions do NOT guarantee identical bits here — the
backend compiler FMA-contracts mul+add chains inside Pallas program bodies
(measured: even a bare `a*b + c` in an interpret-mode kernel evaluates as
fma(a, b, c), while the XLA setup's fusion context computes the plain
two-rounding form; guards — optimization_barrier, opaque selects — do not
block it).  This is the same divergence class as the documented on-chip
Mosaic-vs-XLA:TPU contraction (BENCH.md "Cross-backend exactness"): clip-space
values differ by ~1-2 ULP, amplified through the near-clip lerp on clipped
records.  tests/test_setup_pallas.py therefore pins tolerance-based parity
plus exact structural fields (valid/mesh-id/slot order), not bit-equality.
Intra-frame consistency is unaffected: every consumer (binning, depth prepass,
raster, fused kernel) reads the SAME records, so cross-pass bit-invariants
(e.g. prepass depth == fused kernel depth) hold regardless of which setup path
produced them.

Layout: the triangle axis is reshaped [R, T] -> [R, 8, T/8] in XLA (free,
row-major), so every kernel row is a full (8, LANES) VPU tile — sublanes carry
8 strided triangle spans, lanes carry adjacent triangles.  Each record field /
vertex component is one leading-dim row; all math is row-wise elementwise VPU
work with zero gathers, zero transposes in-kernel.  The kernel emits the two
near-clip slots as separate [32, T] column blocks; the XLA epilogue interleaves
(slot pairs adjacent, preserving the submission order the depth-LESS
first-wins contract requires) and transposes once to the [2T, 32] row records
the binning/raster kernels consume — the same single final transpose the XLA
path already pays.

Reference mapping: this is the same fixed-function stage as
triangle_setup/_setup_cols (D3D12 IA + VS + primitive setup semantics,
geometry.hlsl:27-40, rasterizer state main.cpp:725-766).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import RendererConfig
from .transform import TRI_STRIDE, TRI_VALID, TriSetup, _fv_select_mats

# Lanes per grid step.  Each step's working set is (inputs 50 + outputs 80 +
# live intermediates ~100 rows) x (8, LANES) x 4 B — ~4 MB at 512 lanes.
SETUP_LANES = 512


def _rows(ref):
    a = ref[...]
    return [a[i] for i in range(a.shape[0])]


def _setup_body(
    p, sC, n_in_rows, uv, mid, rec0_ref, rec1_ref, ab0_ref, ab1_ref,
    *, W, H, cull, front_ccw,
):
    """The math of _clip_near_plane_stack + _setup_cols on (8, LANES) rows.

    p: 9 rows (vert-major position comps), sC: 16 rows (selected mvp, row-major
    [k, c]), n_in_rows: 9 transformed world-normal rows or None, uv: list[3][2]
    rows or None, mid: mesh-id row (f32).  Writes both clip slots' records."""
    f32 = jnp.float32
    i32 = jnp.int32

    # Clip-space positions: c[v][k] = sum_j p[v][j] * mvp[j, k] + mvp[3, k]
    # (row-vector convention) — identical association order to
    # _fv_transform_cols' c_cols sum.
    c = [
        [
            p[3 * v] * sC[k] + p[3 * v + 1] * sC[4 + k]
            + p[3 * v + 2] * sC[8 + k] + sC[12 + k]
            for k in range(4)
        ]
        for v in range(3)
    ]
    attrs = n_in_rows is not None
    if attrs:
        n = [[n_in_rows[3 * v + j] for j in range(3)] for v in range(3)]

    # --- Near-plane clip (_clip_near_plane_stack semantics) ---
    z0, z1, z2 = c[0][2], c[1][2], c[2][2]
    in0, in1, in2 = z0 >= 0.0, z1 >= 0.0, z2 >= 0.0
    n_in = in0.astype(i32) + in1.astype(i32) + in2.astype(i32)
    first_in = jnp.where(in0, i32(0), jnp.where(in1, i32(1), i32(2)))
    first_out = jnp.where(~in0, i32(0), jnp.where(~in1, i32(1), i32(2)))
    # (first_out + 1) % 3 without the integer mod (first_out is in {0, 1, 2}).
    fo1 = jnp.where(first_out == 2, i32(0), first_out + 1)
    r = jnp.where(n_in == 1, first_in, jnp.where(n_in == 2, fo1, i32(0)))
    r0 = r == 0
    r1 = r == 1

    def rot(a):
        # rotated[v] = a[(v + r) % 3], the where-chain of the XLA rot().
        return [
            [
                jnp.where(
                    r0, a[v][k], jnp.where(r1, a[(v + 1) % 3][k], a[(v + 2) % 3][k])
                )
                for k in range(len(a[v]))
            ]
            for v in range(3)
        ]

    c = rot(c)
    if attrs:
        n = rot(n)
        uv = rot(uv)
    zA, zB, zC = c[0][2], c[1][2], c[2][2]

    def lerp_t(za, zb):
        d = za - zb
        return za / jnp.where(d == 0.0, 1.0, d)

    tAB = lerp_t(zA, zB)
    tAC = lerp_t(zA, zC)
    tBC = lerp_t(zB, zC)
    sel1 = n_in == 1
    sel2 = n_in == 2
    sel3 = n_in == 3
    s32 = sel3 | sel2

    def clip_attr(a):
        s0 = [[], [], []]
        s1 = [[], [], []]
        for k in range(len(a[0])):
            A, B, C = a[0][k], a[1][k], a[2][k]
            AB = A + (B - A) * tAB
            AC = A + (C - A) * tAC
            BC = B + (C - B) * tBC
            s0v1 = jnp.where(s32, B, jnp.where(sel1, AB, A))
            s0v2 = jnp.where(sel3, C, jnp.where(sel2, BC, jnp.where(sel1, AC, A)))
            s1v1 = jnp.where(sel2, BC, A)
            s1v2 = jnp.where(sel2, AC, A)
            s0[0].append(A)
            s0[1].append(s0v1)
            s0[2].append(s0v2)
            s1[0].append(A)
            s1[1].append(s1v1)
            s1[2].append(s1v2)
        return s0, s1

    c0s, c1s = clip_attr(c)
    if attrs:
        n0s, n1s = clip_attr(n)
        uv0s, uv1s = clip_attr(uv)
    else:
        n0s = n1s = uv0s = uv1s = None

    # --- Per-slot viewport / cull / packing (_setup_cols semantics) ---
    def emit(cv, nv, uvv, rec_ref, ab_ref):
        w = [cv[v][3] for v in range(3)]
        w_ok = (w[0] > 1e-6) & (w[1] > 1e-6) & (w[2] > 1e-6)
        rw = [1.0 / jnp.where(wv == 0.0, 1.0, wv) for wv in w]
        sx = [(cv[v][0] * rw[v] + 1.0) * (W * 0.5) for v in range(3)]
        sy = [(1.0 - cv[v][1] * rw[v]) * (H * 0.5) for v in range(3)]
        sz = [cv[v][2] * rw[v] for v in range(3)]

        area2 = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sy[1] - sy[0]) * (
            sx[2] - sx[0]
        )
        front = (area2 < 0.0) if front_ccw else (area2 > 0.0)
        if cull == "back":
            keep = front
        elif cull == "front":
            keep = ~front
        elif cull == "none":
            keep = front | ~front  # all True (ones_like in the XLA path)
        else:
            raise ValueError(f"unknown cull mode {cull!r}")
        valid = w_ok & keep & (area2 != 0.0)

        minx = jnp.minimum(jnp.minimum(sx[0], sx[1]), sx[2])
        maxx = jnp.maximum(jnp.maximum(sx[0], sx[1]), sx[2])
        miny = jnp.minimum(jnp.minimum(sy[0], sy[1]), sy[2])
        maxy = jnp.maximum(jnp.maximum(sy[0], sy[1]), sy[2])
        on_screen = (maxx >= 0.0) & (minx < W) & (maxy >= 0.0) & (miny < H)
        z_ok = (jnp.maximum(jnp.maximum(sz[0], sz[1]), sz[2]) >= 0.0) & (
            jnp.minimum(jnp.minimum(sz[0], sz[1]), sz[2]) <= 1.0
        )
        valid = valid & on_screen & z_ok

        swap = area2 < 0.0

        def pick(a):
            return (
                a[0],
                jnp.where(swap, a[2], a[1]),
                jnp.where(swap, a[1], a[2]),
            )

        psx = pick(sx)
        psy = pick(sy)
        pz = pick(sz)
        prw = pick(rw)
        area_c = jnp.abs(area2)
        zero = jnp.zeros_like(area_c)

        rec_ref[0] = psx[0]
        rec_ref[1] = psy[0]
        rec_ref[2] = psx[1]
        rec_ref[3] = psy[1]
        rec_ref[4] = psx[2]
        rec_ref[5] = psy[2]
        for v in range(3):
            rec_ref[6 + v] = pz[v]
        for v in range(3):
            rec_ref[9 + v] = prw[v]
        if nv is not None:
            pn = (
                nv[0],
                [jnp.where(swap, nv[2][j], nv[1][j]) for j in range(3)],
                [jnp.where(swap, nv[1][j], nv[2][j]) for j in range(3)],
            )
            puv = (
                uvv[0],
                [jnp.where(swap, uvv[2][k], uvv[1][k]) for k in range(2)],
                [jnp.where(swap, uvv[1][k], uvv[2][k]) for k in range(2)],
            )
            for v in range(3):
                for j in range(3):
                    rec_ref[12 + 3 * v + j] = pn[v][j] * prw[v]
            for v in range(3):
                for k in range(2):
                    rec_ref[21 + 2 * v + k] = puv[v][k] * prw[v]
        else:
            for i in range(12, 27):
                rec_ref[i] = zero
        rec_ref[27] = mid
        rec_ref[28] = valid.astype(f32)
        rec_ref[29] = area_c
        rec_ref[30] = zero
        rec_ref[31] = zero

        ab_ref[0] = jnp.clip(minx, 0.0, float(W))
        ab_ref[1] = jnp.clip(miny, 0.0, float(H))
        ab_ref[2] = jnp.clip(maxx, 0.0, float(W))
        ab_ref[3] = jnp.clip(maxy, 0.0, float(H))
        for i in range(4, 8):
            ab_ref[i] = zero

    emit(c0s, n0s, uv0s, rec0_ref, ab0_ref)
    emit(c1s, n1s, uv1s, rec1_ref, ab1_ref)


def _kernel_full(
    p_ref, nr_ref, uvm_ref, sC_ref, sN_ref,
    rec0_ref, rec1_ref, ab0_ref, ab1_ref, *, W, H, cull, front_ccw,
):
    p = _rows(p_ref)
    sC = _rows(sC_ref)
    nr = _rows(nr_ref)
    sN = _rows(sN_ref)
    UVM = uvm_ref[...]
    # World normals: n[v][j] = sum_i nr[v][i] * model3[i, j] (same association
    # order as _fv_transform_cols' n_cols sum).
    n = [
        [
            nr[3 * v] * sN[j] + nr[3 * v + 1] * sN[3 + j] + nr[3 * v + 2] * sN[6 + j]
            for j in range(3)
        ]
        for v in range(3)
    ]
    n_rows = [n[v][j] for v in range(3) for j in range(3)]
    uv = [[UVM[2 * v + k] for k in range(2)] for v in range(3)]
    mid = UVM[6]
    _setup_body(
        p, sC, n_rows, uv, mid, rec0_ref, rec1_ref, ab0_ref, ab1_ref,
        W=W, H=H, cull=cull, front_ccw=front_ccw,
    )


def _kernel_depth(
    p_ref, mid_ref, sC_ref, rec0_ref, rec1_ref, ab0_ref, ab1_ref,
    *, W, H, cull, front_ccw,
):
    p = _rows(p_ref)
    sC = _rows(sC_ref)
    mid = mid_ref[...][0]
    _setup_body(
        p, sC, None, None, mid, rec0_ref, rec1_ref, ab0_ref, ab1_ref,
        W=W, H=H, cull=cull, front_ccw=front_ccw,
    )


def setup_triangles_pallas(
    geo,
    mvp: jnp.ndarray,
    model: jnp.ndarray,
    cfg: RendererConfig,
    cull: str = "back",
    front_ccw: bool = True,
    attrs: bool = True,
    interpret: bool = False,
) -> TriSetup:
    """Fused-kernel equivalent of _fv_transform_cols + _setup_cols (near_clip
    always on — every product path clips).  Same TriSetup contract: packed
    [2T, TRI_STRIDE], aabb [2T, 4], valid [2T]; equal to the XLA path up to
    FMA-contraction rounding (see module docstring — tolerance-pinned by
    tests).  attrs=False is the depth-only variant (shadow maps): records
    12-26 are zero-filled."""
    assert geo.fv_pos_cols is not None, "setup kernel needs fv column buffers"
    T = geo.tri_mesh_id.shape[0]
    selC, selN = _fv_select_mats(geo.tri_mesh_id, mvp, model, attrs=attrs)
    mid = geo.tri_mesh_id.astype(jnp.float32)[None, :]  # [1, T]
    p9 = geo.fv_pos_cols.reshape(9, T)

    # Lane width shrinks for small scenes (min VPU tile is (8, 128)) so a
    # 12-triangle demo doesn't pad to a full 4096-slot step; flagship scenes
    # use the full SETUP_LANES.
    sublane_rows = -(-T // 8)                       # ceil(T / 8)
    lanes = min(SETUP_LANES, -(-sublane_rows // 128) * 128)
    mult = 8 * lanes
    T8 = -(-T // mult) * mult
    grid = (T8 // mult,)
    Tc = T8 // 8

    def prep(a):
        R = a.shape[0]
        if T8 != T:
            a = jnp.pad(a, ((0, 0), (0, T8 - T)))
        return a.reshape(R, 8, Tc)

    def spec(R):
        return pl.BlockSpec((R, 8, lanes), lambda i: (0, 0, i))

    out_shape = [
        jax.ShapeDtypeStruct((32, 8, Tc), jnp.float32),
        jax.ShapeDtypeStruct((32, 8, Tc), jnp.float32),
        jax.ShapeDtypeStruct((8, 8, Tc), jnp.float32),
        jax.ShapeDtypeStruct((8, 8, Tc), jnp.float32),
    ]
    out_specs = [spec(32), spec(32), spec(8), spec(8)]
    kw = dict(W=cfg.width, H=cfg.height, cull=cull, front_ccw=front_ccw)

    if attrs:
        nr9 = geo.fv_nrm_cols.reshape(9, T)
        uvm = jnp.concatenate([geo.fv_uv_cols.reshape(6, T), mid], axis=0)
        rec0, rec1, ab0, ab1 = pl.pallas_call(
            functools.partial(_kernel_full, **kw),
            grid=grid,
            in_specs=[spec(9), spec(9), spec(7), spec(16), spec(9)],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(prep(p9), prep(nr9), prep(uvm), prep(selC), prep(selN))
    else:
        rec0, rec1, ab0, ab1 = pl.pallas_call(
            functools.partial(_kernel_depth, **kw),
            grid=grid,
            in_specs=[spec(9), spec(1), spec(16)],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(prep(p9), prep(mid), prep(selC))

    # Interleave the slot pairs (out[2t] = slot0 of tri t — the submission
    # order the depth-LESS first-wins contract pins) and transpose once to row
    # records (the XLA path's single final transpose, transform.py:378).
    rec0 = rec0.reshape(32, T8)[:, :T]
    rec1 = rec1.reshape(32, T8)[:, :T]
    packed = jnp.stack([rec0, rec1], axis=-1).reshape(TRI_STRIDE, 2 * T).T
    ab0 = ab0.reshape(8, T8)[:4, :T]
    ab1 = ab1.reshape(8, T8)[:4, :T]
    aabb = jnp.stack([ab0, ab1], axis=-1).reshape(4, 2 * T).T
    valid = packed[:, TRI_VALID] > 0.0
    return TriSetup(packed=packed, aabb=aabb, valid=valid)

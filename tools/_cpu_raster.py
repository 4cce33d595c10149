"""Fast NumPy depth/normal rasterizer for CPU-side probes and calibration.

The pure-XLA oracle (`ops/raster_ref.py`) scans every triangle over the FULL
[H, W] grid — exact, but O(T*H*W): hours for one 1080p frame on CPU.  Probe
tools (tools/lit_tiles.py, tools/roofline.py) only need per-frame depth /
winner-normal statistics, so this evaluates each live triangle only on its
AABB box (O(sum of covered boxes) ~ a few Mpx/frame) with the same edge
functions, top-left rule, and depth-LESS test as the oracle.  NOT a semantics
oracle — tie-break order differs (last-wins on exact depth ties vs the
oracle's first-wins), which cannot change any coverage/NdotL>0 statistic by
more than the measurement margin probes already carry.
"""
from __future__ import annotations

import numpy as np

from d3d12_deferred_renderer_tpu.ops.transform import (
    TRI_MESH_ID, TRI_N0, TRI_N1, TRI_N2, TRI_RW0, TRI_RW1, TRI_RW2,
    TRI_VALID, TRI_X0, TRI_X1, TRI_X2, TRI_Y0, TRI_Y1, TRI_Y2,
    TRI_Z0, TRI_Z1, TRI_Z2,
)


def raster_depth_normal(packed: np.ndarray, H: int, W: int):
    """Returns (depth [H,W] f32 cleared to 1.0, normal [H,W,3] f32,
    mesh_id [H,W] i32 cleared to -1) for live records of `packed` [T,32]."""
    depth = np.ones((H, W), np.float32)
    normal = np.zeros((H, W, 3), np.float32)
    mesh = np.full((H, W), -1, np.int32)
    live = packed[:, TRI_VALID] > 0
    for tri in packed[live]:
        x0, y0, x1, y1, x2, y2 = tri[[TRI_X0, TRI_Y0, TRI_X1, TRI_Y1,
                                      TRI_X2, TRI_Y2]]
        lo_x = max(int(np.floor(min(x0, x1, x2))), 0)
        hi_x = min(int(np.ceil(max(x0, x1, x2))) + 1, W)
        lo_y = max(int(np.floor(min(y0, y1, y2))), 0)
        hi_y = min(int(np.ceil(max(y0, y1, y2))) + 1, H)
        if lo_x >= hi_x or lo_y >= hi_y:
            continue
        px = np.arange(lo_x, hi_x, dtype=np.float32) + 0.5
        py = (np.arange(lo_y, hi_y, dtype=np.float32) + 0.5)[:, None]

        def edge(ax, ay, bx, by):
            # Same convention as raster_ref._edge_coeffs: canonical positive-
            # area winding, e > 0 strictly inside, e == 0 iff top/left edge.
            A, B = ay - by, bx - ax
            C = ax * by - bx * ay
            dx, dy = bx - ax, by - ay
            tl = (dy == 0.0 and dx > 0.0) or (dy < 0.0)
            return A * px + B * py + C, tl

        e0, t0 = edge(x1, y1, x2, y2)
        e1, t1 = edge(x2, y2, x0, y0)
        e2, t2 = edge(x0, y0, x1, y1)
        area = e0 + e1 + e2
        cov = (
            ((e0 > 0) | ((e0 == 0) & t0))
            & ((e1 > 0) | ((e1 == 0) & t1))
            & ((e2 > 0) | ((e2 == 0) & t2))
        )
        if not cov.any():
            continue
        w0, w1, w2 = e0 / area, e1 / area, e2 / area
        z = w0 * tri[TRI_Z0] + w1 * tri[TRI_Z1] + w2 * tri[TRI_Z2]
        win = cov & (z < depth[lo_y:hi_y, lo_x:hi_x]) & (z >= 0.0)
        if not win.any():
            continue
        rw = w0 * tri[TRI_RW0] + w1 * tri[TRI_RW1] + w2 * tri[TRI_RW2]
        n = (
            w0[..., None] * tri[TRI_N0:TRI_N0 + 3]
            + w1[..., None] * tri[TRI_N1:TRI_N1 + 3]
            + w2[..., None] * tri[TRI_N2:TRI_N2 + 3]
        ) / np.maximum(rw, 1e-12)[..., None]
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        d_box = depth[lo_y:hi_y, lo_x:hi_x]
        n_box = normal[lo_y:hi_y, lo_x:hi_x]
        m_box = mesh[lo_y:hi_y, lo_x:hi_x]
        d_box[win] = z[win]
        n_box[win] = n[win]
        m_box[win] = np.int32(tri[TRI_MESH_ID])
    return depth, normal, mesh

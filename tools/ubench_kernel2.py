"""Isolate the per-tile fixed cost: which prologue/epilogue piece is ~1.5us?

All variants: grid (NT,), C=1 chunk of real edge/z work per tile.
  base    — current shape: flat (1,P) math, reshape to (8,128), 2D out block
  noshape — same math, out block (1,1,P): store flat, NO reshape
  nofori  — static python chunk loop instead of lax.fori_loop, with reshape
  noop    — kernel writes constant tile, no math at all (floor: grid+DMA+store)
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache

NT = 2025
K = 64
S = 40
TH, TW = 8, 128
P = TH * TW
CH = 8


def core(t, px, py, depth):
    def col(F):
        return t[:, F : F + 1]

    def edge(ax, ay, bx, by):
        A = ay - by
        B = bx - ax
        C = ax * by - bx * ay
        e = A * px + B * py + C
        tl = (((by - ay) == 0.0) & ((bx - ax) > 0.0)) | ((by - ay) < 0.0)
        return (e > 0.0) | ((e == 0.0) & tl), e

    c0, e0 = edge(col(2), col(3), col(4), col(5))
    c1, e1 = edge(col(4), col(5), col(0), col(1))
    c2, e2 = edge(col(0), col(1), col(2), col(3))
    covered = c0 & c1 & c2
    inv_area = 1.0 / col(29)
    b0 = e0 * inv_area
    b1 = e1 * inv_area
    b2 = e2 * inv_area
    z = b0 * col(6) + b1 * col(7) + b2 * col(8)
    elig = covered & (z >= 0.0) & (z <= 1.0)
    zm = jnp.where(elig, z, 2.0)
    zmin = jnp.min(zm, axis=0, keepdims=True)
    return jnp.where(zmin < depth, zmin, depth)


def pxpy():
    fi = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    row = jnp.floor(fi * (1.0 / TW))
    return 0.5 + (fi - row * TW), 0.5 + row


def kern_base(counts, tris_ref, out_ref):
    px, py = pxpy()

    def body(c, depth):
        return core(tris_ref[0, pl.ds(c * CH, CH), :], px, py, depth)

    depth = jax.lax.fori_loop(0, counts[pl.program_id(0)], body,
                              jnp.ones((1, P), jnp.float32))
    out_ref[:, :] = depth.reshape(TH, TW)


def kern_noshape(counts, tris_ref, out_ref):
    px, py = pxpy()

    def body(c, depth):
        return core(tris_ref[0, pl.ds(c * CH, CH), :], px, py, depth)

    depth = jax.lax.fori_loop(0, counts[pl.program_id(0)], body,
                              jnp.ones((1, P), jnp.float32))
    out_ref[0, :, :] = depth


def kern_nofori(counts, tris_ref, out_ref):
    px, py = pxpy()
    depth = jnp.ones((1, P), jnp.float32)
    depth = core(tris_ref[0, 0:CH, :], px, py, depth)
    out_ref[:, :] = depth.reshape(TH, TW)


def kern_noop(counts, tris_ref, out_ref):
    out_ref[:, :] = jnp.full((TH, TW), 0.5, jnp.float32)


def run(kern, flat_out):
    counts = jnp.full((NT,), 1, jnp.int32)
    rng = np.random.RandomState(0)
    recs = jnp.asarray(rng.uniform(0.0, 1.0, (NT, K, S)).astype(np.float32))
    if flat_out:
        out_specs = pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NT, 1, P), jnp.float32)
    else:
        out_specs = pl.BlockSpec((TH, TW), lambda i, *_: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((NT * TH, TW), jnp.float32)
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, K, S), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
    )

    @jax.jit
    def step(r):
        o = f(counts, r)
        r = r.at[:, :, 6].add(jnp.float32(1e-7))
        return r, jnp.sum(o)

    r = recs
    r, ck = step(r)
    float(ck)
    t0 = time.time()
    n = 10
    for _ in range(n):
        r, ck = step(r)
    float(ck)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    for name, kern, flat in [
        ("base", kern_base, False),
        ("noshape", kern_noshape, True),
        ("nofori", kern_nofori, False),
        ("noop", kern_noop, False),
    ]:
        ms = run(kern, flat)
        print(f"{name:>8}: {ms:6.2f} ms  ({ms / NT * 1e6:7.0f} ns/tile)", flush=True)


if __name__ == "__main__":
    main()

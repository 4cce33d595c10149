"""Micro-bench: isolate the chunked raster kernel's per-chunk and per-tile costs.

Synthetic grid of NT tiles; every tile loops exactly C chunks of the edge/z core.
Sweeping C separates slope (per-chunk cost) from intercept (per-tile overhead).
Variants:
  dyn    — dynamic fori_loop trip + dynamic-start record slice (current design)
  static — python-unrolled chunk offsets (constant starts), same math
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


def kern_dyn(counts, tris_ref, out_ref, *, nchunks):
    fi = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    row = jnp.floor(fi * (1.0 / TW))
    py = 0.5 + row
    px = 0.5 + (fi - row * TW)

    def body(c, depth):
        t = tris_ref[0, pl.ds(c * CH, CH), :]
        return core(t, px, py, depth)

    depth = jax.lax.fori_loop(0, counts[pl.program_id(0)], body,
                              jnp.ones((1, P), jnp.float32))
    out_ref[:, :] = depth.reshape(TH, TW)


def kern_static(counts, tris_ref, out_ref, *, nchunks):
    fi = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    row = jnp.floor(fi * (1.0 / TW))
    py = 0.5 + row
    px = 0.5 + (fi - row * TW)
    depth = jnp.ones((1, P), jnp.float32)
    for c in range(nchunks):
        t = tris_ref[0, c * CH : (c + 1) * CH, :]
        depth = core(t, px, py, depth)
    out_ref[:, :] = depth.reshape(TH, TW)


def run(kern, nchunks, counts, recs):
    f = pl.pallas_call(
        functools.partial(kern, nchunks=nchunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(NT,),
            in_specs=[pl.BlockSpec((1, K, S), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TH, TW), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((NT * TH, TW), jnp.float32),
    )

    @jax.jit
    def step(r):
        o = f(counts, r)
        # evolve input so repeated dispatches do real work
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
    rng = np.random.RandomState(0)
    recs = jnp.asarray(rng.uniform(0.0, 1.0, (NT, K, S)).astype(np.float32))
    for name, kern in [("dyn", kern_dyn), ("static", kern_static)]:
        for C in (1, 2, 4, 8):
            counts = jnp.full((NT,), C, jnp.int32)
            ms = run(kern, C, counts, recs)
            print(f"{name:>7} C={C}: {ms:6.2f} ms  ({ms / NT / C * 1e6:7.1f} ns/chunk-incl-fixed)",
                  flush=True)


if __name__ == "__main__":
    main()

"""Measure the ONLY dynamic store Mosaic offers — row-granular (8x128-tiled)
VMEM writes — to complete the counting/radix-sort placement evidence
(VERDICT r4 task 4).

Findings chain (2026-08-21, v5e):
  1. tools/ubench_sort.py: XLA's scatter (20.4/8.3/5.3 ns/key at 73k/294k/
     1.18M) and inverse-permutation gather (39/11/9 ns/key) EACH cost more
     than the entire XLA sort (13.6/4.3/2.9 ns/key) at the binning pair-array
     sizes — so a counting sort built from XLA primitives loses before its
     rank computation even starts.
  2. Mosaic rejects scalar stores to VMEM outright ("Cannot store scalars to
     VMEM"), and a (n, 1) layout pads the lane dim 128x (blows VMEM), so a
     Pallas kernel cannot express element-granular placement at all.
  3. This tool: the expressible primitive is a dynamic-offset ROW store
     (128 lanes).  One unsorted element forces one full row write, so the
     measured ns/row IS the per-element placement floor for a Pallas radix
     pass — grouping elements to share a row write is itself the sort.

Run on TPU: python tools/ubench_pallas_scatter.py
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


def _row_scatter_kernel(idx_ref, val_ref, out_ref, *, n):
    # idx rides in SMEM (scalar prefetch) — dynamic lane-indexed loads from
    # VMEM are themselves unexpressible ("index in dimension 1 must be a
    # multiple of 128"), one more face of the no-element-granularity wall.
    def body(i, carry):
        j = idx_ref[i]
        out_ref[pl.ds(j, 1), :] = val_ref[pl.ds(i, 1), :]
        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_row_scatter(idx, val, n):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((n, 128), lambda g, idx: (0, 0))],
        out_specs=pl.BlockSpec((n, 128), lambda g, idx: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_row_scatter_kernel, n=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.int32),
    )(idx, val)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for n in (4096, 8192):
        idx = jnp.asarray(rng.permutation(n).astype(np.int32))
        val = jnp.asarray(
            rng.integers(0, 1 << 30, (n, 128), dtype=np.int32)
        )
        out = pallas_row_scatter(idx, val, n)
        jax.device_get(out[:1, :1])
        t0 = time.time()
        reps = 20
        for _ in range(reps):
            out = pallas_row_scatter(idx, val, n)
        jax.device_get(out[:1, :1])
        dt = (time.time() - t0) / reps
        print(
            f"n={n} rows: {dt * 1e3:8.3f} ms  ({dt * 1e9 / n:6.2f} ns/row "
            f"= per-element placement floor)"
        )


if __name__ == "__main__":
    main()

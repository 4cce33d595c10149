"""Measure the pure input-DMA + grid-step floor for the real block shapes.

No-op kernels (write a constant, never read the block) over:
  a) grid 2025, in (1,512,128)   — per-tile contiguous records
  b) grid  405, in (5,512,128)   — grouped contiguous records (current design)
  c) grid  405, in (5,512,40)    — grouped strided records (lane-padded rows)
  d) grid  405, in none          — no input block at all
"""
from __future__ import annotations

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
TH, TW = 8, 128


def run(grid0, block, S, with_input):
    counts = jnp.zeros((NT,), jnp.int32)
    G = NT // grid0

    def kern(counts, *refs):
        out_ref = refs[-1]
        out_ref[:, :] = jnp.full((TH, G * TW), 0.5, jnp.float32)

    in_specs = []
    args = []
    if with_input:
        recs = jnp.asarray(
            np.random.RandomState(0).uniform(0, 1, (NT, 512, S)).astype(np.float32)
        )
        in_specs = [pl.BlockSpec((block, 512, S), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)]
        args = [recs]
    f = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid0,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TH, G * TW), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((TH, NT * TW), jnp.float32),
    )

    @jax.jit
    def step(x, *a):
        o = f(counts, *a)
        return x + 1.0, jnp.sum(o) + x

    x = jnp.float32(0.0)
    x, ck = step(x, *args)
    float(ck)
    t0 = time.time()
    n = 10
    for _ in range(n):
        x, ck = step(x, *args)
    float(ck)
    return (time.time() - t0) / n * 1e3


def main():
    enable_compilation_cache()
    assert jax.default_backend() == "tpu"
    for name, grid0, block, S, wi in [
        ("tile_contig  (2025,(1,512,128))", 2025, 1, 128, True),
        ("group_contig ( 405,(5,512,128))", 405, 5, 128, True),
        ("group_strided( 405,(5,512, 40))", 405, 5, 40, True),
        ("noinput      ( 405,-)          ", 405, 5, 40, False),
        ("noinput      (2025,-)          ", 2025, 1, 40, False),
    ]:
        ms = run(grid0, block, S, wi)
        print(f"{name}: {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

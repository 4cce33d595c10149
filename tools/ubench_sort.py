"""Microbenchmark the primitives a Pallas/XLA counting-radix sort would need,
vs the shipped XLA sort, at the binning workload's actual sizes (VERDICT r4
task 4: the 1080p pair sort is ~0.8 ms of 4.82, the 4K one 4.26 of 15.43).

A counting sort is: histogram (cheap here — the per-tile counts come free
from a 2D difference grid) -> prefix sum (trivial) -> PLACEMENT, which needs
either a scatter (out[dst[p]] = v[p]) or an inverse-permutation gather.  TPUs
have no vector scatter unit, so the placement step is the whole question.
This tool measures, at P = the real pair-array sizes:

  xla-sort-1key      : the shipped single-int32-key sort (the baseline)
  xla-sort-u16-seg   : jnp sort of 16-bit keys (key-width scaling probe)
  xla-scatter-unique : zeros.at[dst].set(v) with a random permutation dst
  xla-take-perm      : v[perm] gather (the cost if we could invert cheaply)
  argsort-int32      : jnp.argsort (sort + payload, what placement-by-sort costs)

Run on TPU: python tools/ubench_sort.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from d3d12_deferred_renderer_tpu.utils.debug import enable_compilation_cache


def timeit(fn, *args, n=50):
    # Warm-up compile + a single forced run to scale n (XLA:TPU scatter can
    # be pathologically slow; don't loop 50x over a multi-second op).
    r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][:1])
    t0 = time.time()
    r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][:1])
    once = time.time() - t0
    if once > 0.5:
        n = max(2, int(2.0 / once))
    # checksum-force through a tiny readback (remote transport; CLAUDE.md)
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0][:1])
    dt = (time.time() - t0) / n
    return dt * 1e3


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for P, NT in [(73_544, 2026), (294_176, 8101), (1_179_648, 8101)]:
        keys = rng.integers(0, NT * 65536, size=P, dtype=np.int32)
        dst = rng.permutation(P).astype(np.int32)
        vals = rng.integers(0, 65536, size=P, dtype=np.int32)
        k16 = (keys % 65536).astype(np.uint16)
        dk, ddst, dv, dk16 = map(jnp.asarray, (keys, dst, vals, k16))

        sort1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
        sortu16 = jax.jit(lambda k: jnp.sort(k))
        scat = jax.jit(
            lambda d, v: jnp.zeros(v.shape[0], v.dtype).at[d].set(v)
        )
        takep = jax.jit(lambda v, d: v[d])
        argst = jax.jit(lambda k: jnp.argsort(k))

        r = {
            "xla-sort-1key": timeit(sort1, dk),
            "xla-sort-u16": timeit(sortu16, dk16),
            "xla-scatter-unique": timeit(scat, ddst, dv),
            "xla-take-perm": timeit(takep, dv, ddst),
            "argsort-int32": timeit(argst, dk),
        }
        print(f"P={P} NT={NT}:")
        for k, v in r.items():
            print(f"  {k:>20}: {v:8.3f} ms  ({v * 1e6 / P:6.2f} ns/key)")


if __name__ == "__main__":
    main()

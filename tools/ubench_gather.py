"""Micro-benchmark: PCF shadow-tap gather strategies on TPU.

Four flat element-gathers per bilinear-cmp sample (current sampling.py) vs one
row-gather from a quad-packed [(S+1)*(S+1), 4] table vs one gather from a
transposed [4, N] layout.  Decides the sample_bilinear_cmp implementation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=20):
    fn = jax.jit(fn)
    ck = fn(*args)
    float(ck)
    t0 = time.time()
    for _ in range(n):
        ck = fn(*args)
    float(ck)
    return (time.time() - t0) / n * 1e3


def main():
    assert jax.default_backend() == "tpu"
    S = 1024
    key = jax.random.PRNGKey(0)
    tex = jax.random.uniform(key, (S, S), jnp.float32)
    for H, W in ((360, 640), (540, 960), (1080, 1920)):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        # uv-ish sample coords with spatial coherence (like a real shadow lookup)
        u = jnp.linspace(0.1, 0.9, W)[None, :] + jax.random.uniform(k1, (H, W)) * 1e-3
        v = jnp.linspace(0.1, 0.9, H)[:, None] + jax.random.uniform(k2, (H, W)) * 1e-3
        ref = jax.random.uniform(k3, (H, W))

        fx = u * S - 0.5
        fy = v * S - 0.5
        x0 = jnp.floor(fx).astype(jnp.int32)
        y0 = jnp.floor(fy).astype(jnp.int32)

        def four_gathers(tex, x0, y0, ref):
            tf = tex.reshape(-1)

            def tap(xi, yi):
                xi = jnp.clip(xi, 0, S - 1)
                yi = jnp.clip(yi, 0, S - 1)
                return (ref <= tf[yi * S + xi]).astype(jnp.float32)

            c00 = tap(x0, y0)
            c10 = tap(x0 + 1, y0)
            c01 = tap(x0, y0 + 1)
            c11 = tap(x0 + 1, y0 + 1)
            return jnp.sum(c00 + c10 + c01 + c11)

        p = jnp.pad(tex, ((1, 1), (1, 1)), mode="edge")
        quads = jnp.stack(
            [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1
        )[: S + 1, : S + 1]
        qflat = quads.reshape(-1, 4)

        def quad_gather(qflat, x0, y0, ref):
            idx = (y0 + 1) * (S + 1) + (x0 + 1)
            taps = qflat[idx]  # [H, W, 4] one row-gather
            return jnp.sum((ref[..., None] <= taps).astype(jnp.float32))

        qT = qflat.T  # [4, N]

        def quad_gather_T(qT, x0, y0, ref):
            idx = (y0 + 1) * (S + 1) + (x0 + 1)
            taps = qT[:, idx]  # [4, H, W]
            return jnp.sum((ref[None] <= taps).astype(jnp.float32))

        a = timed(four_gathers, tex, x0, y0, ref)
        b = timed(quad_gather, qflat, x0, y0, ref)
        c = timed(quad_gather_T, qT, x0, y0, ref)
        print(f"{H}x{W}: four={a:6.2f} ms  quad-last={b:6.2f} ms  "
              f"quad-T={c:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

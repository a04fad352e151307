"""Probe the per-scan-iteration / per-op cost floor on the attached TPU.

Every BA piece measured ~0.4 ms/iter regardless of shape, and the fused
solve runs ~250x below VPU speed of light with NO single hot piece —
suggesting a fixed per-op or per-scan-iteration floor on this stack rather
than a math/layout problem. This times lax.scan bodies of n_ops chained
elementwise ops at several shapes: cost(n_ops, shape)/iter separates
  * per-scan-iteration overhead (intercept at n_ops -> 0),
  * per-op overhead (slope in n_ops),
  * bandwidth/compute (shape scaling).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 50


def timed(fn, x, reps=3):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / REPS * 1e3


def make(n_ops):
    @jax.jit
    def run(x):
        def body(c, _):
            y = c
            for i in range(n_ops):
                y = y * 1.000001 + 1e-9
            return y, None
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return c

    return run


def make_matmul(n_mm, k):
    @jax.jit
    def run(x):
        def body(c, _):
            y = c
            for _ in range(n_mm):
                y = jnp.tanh(y @ jnp.eye(k, dtype=y.dtype) + 1e-9)
            return y, None
        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return c

    return run


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    for shape in [(128,), (4096,), (4096, 32), (4096, 512)]:
        x = jnp.ones(shape, jnp.float32)
        row = [f"shape={str(shape):12s}:"]
        for n_ops in (1, 10, 50, 200):
            ms = timed(make(n_ops), x)
            row.append(f"ops{n_ops}={ms:7.4f}")
        print("  ".join(row) + "  (ms/scan-iter)", flush=True)
    # Small-matmul chains (the BA iteration is ~dozens of tiny contractions).
    for k in (6, 32, 192):
        x = jnp.ones((k, k), jnp.float32)
        row = [f"matmul k={k:4d}:"]
        for n_mm in (1, 8, 32):
            ms = timed(make_matmul(n_mm, k), x)
            row.append(f"mm{n_mm}={ms:7.4f}")
        print("  ".join(row) + "  (ms/scan-iter)", flush=True)


if __name__ == "__main__":
    main()

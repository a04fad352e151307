"""Relay transfer/dispatch microbenchmarks: what does a host->device image
upload, a scalar fetch, and an eager op cost through the axon tunnel?
Also probes whether the persistent compilation cache works on this stack.
"""
import time

import numpy as np


def t(fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    H, W = 376, 1240
    f32 = np.random.rand(H, W).astype(np.float32)
    u8 = (f32 * 255).astype(np.uint8)
    stack8_u8 = np.stack([u8] * 8)
    stack8_f32 = np.stack([f32] * 8)

    def up(x):
        return lambda: jax.block_until_ready(jnp.asarray(x))

    def up_async(x):
        return lambda: jnp.asarray(x)

    print(f"upload f32 {f32.nbytes/1e6:.1f}MB blocked: {t(up(f32)):.1f} ms")
    print(f"upload u8  {u8.nbytes/1e6:.1f}MB blocked: {t(up(u8)):.1f} ms")
    print(f"upload f32 submit-only: {t(up_async(f32)):.1f} ms")
    print(f"upload u8  submit-only: {t(up_async(u8)):.1f} ms")
    print(f"upload (8,H,W) u8 {stack8_u8.nbytes/1e6:.1f}MB blocked: {t(up(stack8_u8), n=10):.1f} ms")
    print(f"upload (8,H,W) f32 {stack8_f32.nbytes/1e6:.1f}MB blocked: {t(up(stack8_f32), n=5):.1f} ms")

    x = jnp.arange(16.0)
    jax.block_until_ready(x)
    print(f"scalar fetch int(x[0]): {t(lambda: int(x.sum())):.1f} ms")
    small = jax.device_put(np.eye(4, dtype=np.float32))
    print(f"small fetch np.asarray(4x4): {t(lambda: np.asarray(small)):.1f} ms")
    a, b, c = (jax.device_put(np.random.rand(2000).astype(np.float32)) for _ in range(3))
    print(f"device_get 3 arrays batched: {t(lambda: jax.device_get((a, b, c))):.1f} ms")
    print(f"3 separate np.asarray:      {t(lambda: (np.asarray(a), np.asarray(b), np.asarray(c))):.1f} ms")

    # Eager op dispatch cost (what the un-jitted triangulation path pays).
    m = jax.device_put(np.random.rand(2000, 3).astype(np.float32))
    def eager():
        y = m * 2.0
        y = y + 1.0
        y = y @ jnp.ones((3, 3), jnp.float32)
        return jax.block_until_ready(y)
    print(f"3 eager ops + block: {t(eager):.1f} ms")

    @jax.jit
    def fused(m):
        return (m * 2.0 + 1.0) @ jnp.ones((3, 3), jnp.float32)
    jax.block_until_ready(fused(m))
    print(f"same, one jit + block: {t(lambda: jax.block_until_ready(fused(m))):.1f} ms")

    # Compilation cache probe: compile a distinctive fn, report timing; run
    # this script twice to see whether the 2nd process hits the cache.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/logs/xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    @jax.jit
    def probe(v):
        for _ in range(30):
            v = jnp.tanh(v @ jnp.eye(64, dtype=jnp.float32)) + 0.103
        return v

    v = jnp.ones((64, 64), jnp.float32)
    t0 = time.perf_counter()
    jax.block_until_ready(probe(v))
    print(f"probe compile+run: {time.perf_counter()-t0:.2f} s")


if __name__ == "__main__":
    main()

"""Host->device upload strategies for the chunked pipeline, on the real TPU.

The full-pipeline stage profile (benchlogs/q_fullpipe_stages_bench.log) puts
`stack_imgs` at ~300 ms p50 per 8-frame chunk of (376, 1240) f16 — the
single largest leg of the 352 ms/chunk the bench observes, i.e. the
pipeline is RELAY-UPLOAD-BOUND. This measures, honestly (block on a tiny
consumer that forces the data to be resident):

  a) current: np.stack on host -> one jnp.asarray          (sync transfer)
  b) per-frame jax.device_put at 'arrival', device stack    (async puts)
  c) like (b) with a chunk of device compute in flight      (overlap test)
  d) u8 upload + on-device f32 cast                         (half bytes)
  e) f32->f16 astype host cost alone                        (CPU leg)

(c) is the deployment question: does the relay DMA chunk N+1's frames
while the device computes chunk N?  If yes, steady state = max(legs), not
sum, and the upload leg can hide entirely under compute+fetch.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

H, W, C = 376, 1240, 8
REPS = 6


def mk_frames(dtype):
    rng = np.random.default_rng(0)
    f = rng.uniform(0, 255, (C, H, W)).astype(np.float32)
    if dtype == np.uint8:
        return [np.clip(np.round(x), 0, 255).astype(np.uint8) for x in f]
    return [x.astype(dtype) for x in f]


@jax.jit
def consume(x):
    # Touch every element cheaply; forces residency without real compute.
    return jnp.sum(x.astype(jnp.float32))


@jax.jit
def heavy(x):
    # ~chunk-compute-sized stand-in: a few big matmuls off the image data.
    a = x.astype(jnp.float32).reshape(C, -1)[:, : 2048 * 64].reshape(-1, 2048)
    w = jnp.ones((2048, 2048), jnp.float32) * 1e-6
    for _ in range(24):
        a = jnp.tanh(a @ w + 1e-9)
    return jnp.sum(a)


def timeit(fn, reps=REPS):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    dev = jax.devices()[0]
    print("device:", dev.device_kind, flush=True)

    f16 = mk_frames(np.float16)
    u8 = mk_frames(np.uint8)

    def a_stack_asarray():
        x = jnp.asarray(np.stack(f16))
        jax.block_until_ready(consume(x))

    def b_perframe_put():
        bufs = [jax.device_put(f, dev) for f in f16]
        x = jnp.stack(bufs)
        jax.block_until_ready(consume(x))

    def d_u8():
        x = jnp.asarray(np.stack(u8))
        jax.block_until_ready(consume(x))

    def d_u8_perframe():
        bufs = [jax.device_put(f, dev) for f in u8]
        x = jnp.stack(bufs)
        jax.block_until_ready(consume(x))

    print(f"a) host stack + asarray f16 : {timeit(a_stack_asarray):8.1f} ms")
    print(f"b) per-frame put + dev stack: {timeit(b_perframe_put):8.1f} ms")
    print(f"d) u8 one transfer          : {timeit(d_u8):8.1f} ms")
    print(f"d') u8 per-frame put        : {timeit(d_u8_perframe):8.1f} ms")

    # e) host-side f32->f16 astype cost (the _upload_cast leg).
    f32 = mk_frames(np.float32)
    t0 = time.perf_counter()
    for _ in range(REPS):
        _ = [x.astype(np.float16) for x in f32]
    print(f"e) f32->f16 astype x{C}      : "
          f"{(time.perf_counter() - t0) / REPS * 1e3:8.1f} ms")

    # c) overlap: launch heavy compute on resident data, then upload the
    # next chunk while it runs. If upload DMAs concurrently, the combined
    # wall is ~max(heavy, upload) rather than the sum.
    resident = jnp.asarray(np.stack(f16))
    jax.block_until_ready(consume(resident))

    def heavy_only():
        jax.block_until_ready(heavy(resident))

    t_heavy = timeit(heavy_only)
    print(f"c0) heavy compute alone     : {t_heavy:8.1f} ms")

    def overlap():
        h = heavy(resident)  # async dispatch
        bufs = [jax.device_put(f, dev) for f in f16]
        x = jnp.stack(bufs)
        jax.block_until_ready(consume(x))
        jax.block_until_ready(h)

    t_ov = timeit(overlap)
    t_up = timeit(b_perframe_put)
    print(f"c) heavy + upload overlapped: {t_ov:8.1f} ms "
          f"(sum would be {t_heavy + t_up:.1f}, max {max(t_heavy, t_up):.1f})")


if __name__ == "__main__":
    main()

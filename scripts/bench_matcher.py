"""A/B benchmark: XLA matcher vs Pallas hamming_top2 on production shapes.

Runs on the real TPU. Wraps N repeated applications in one jitted lax.scan
(inputs varied by rolling) so the axon relay's per-dispatch inflation does
not pollute the comparison; reports per-call device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visual_slam_tpu.ops import matching as m_ops
from visual_slam_tpu.ops.orb import unpack_bits
from visual_slam_tpu.ops.pallas_kernels import hamming_top2_batched

REPS = 50


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms per call


def bench_single(K1, K2):
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 2**32, (K1, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (K2, 8), dtype=np.uint32))
    v1 = jnp.ones(K1, bool)
    v2 = jnp.ones(K2, bool)

    @jax.jit
    def xla_loop(d1, d2):
        # Explicit XLA primitives: match_descriptors itself routes to the
        # Pallas kernel on TPU, which would make this arm compare Pallas
        # against Pallas.
        def body(c, _):
            a, b = c
            dist = m_ops.hamming_distance_matrix(a, b, v1, v2)
            ti, d, ok = m_ops.match_nn(dist, ratio=0.75, cross_check=True)
            ok = m_ops.unique_train(ti, d, ok, K2)
            n = jnp.sum(ok)
            a = jnp.roll(a, 1, 0) + n.astype(jnp.uint32)
            return (a, b), n

        (_, _), ns = jax.lax.scan(body, (d1, d2), None, length=REPS)
        return ns

    @jax.jit
    def pallas_loop(d1, d2):
        def body(c, _):
            a, b = c
            b1 = unpack_bits(a)
            b2 = unpack_bits(b)
            p1 = jnp.sum(b1.astype(jnp.float32), -1)
            p2 = jnp.sum(b2.astype(jnp.float32), -1)
            best, second, bidx, colarg = hamming_top2_batched(
                b1, p1, v1, b2[None], p2[None], v2[None]
            )
            ok = (best[0] < 1e8) & (best[0] < 0.75 * second[0])
            ok &= colarg[0][bidx[0]] == jnp.arange(K1)
            n = jnp.sum(ok)
            a = jnp.roll(a, 1, 0) + n.astype(jnp.uint32)
            return (a, b), n

        (_, _), ns = jax.lax.scan(body, (d1, d2), None, length=REPS)
        return ns

    tx = timeit(xla_loop, d1, d2)
    tp = timeit(pallas_loop, d1, d2)
    print(f"single K1={K1} K2={K2}: xla {tx:.3f} ms  pallas {tp:.3f} ms  speedup {tx/tp:.2f}x", flush=True)
    return tx, tp


def bench_batched(C, K):
    rng = np.random.default_rng(1)
    dq = jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32))
    dc = jnp.asarray(rng.integers(0, 2**32, (C, K, 8), dtype=np.uint32))
    vq = jnp.ones(K, bool)
    vc = jnp.ones((C, K), bool)
    aq = jnp.zeros(K, jnp.float32)

    @jax.jit
    def xla_loop(dq, dc):
        # Explicit lax.map over XLA primitives (see note in bench_single).
        def body(c, _):
            q, t = c

            def one(cand):
                d2, v2 = cand
                dist = m_ops.hamming_distance_matrix(q, d2, vq, v2)
                ti, d, ok = m_ops.match_nn(dist, ratio=0.75, cross_check=True)
                return jnp.sum(m_ops.unique_train(ti, d, ok, K))

            ns = jax.lax.map(one, (t, vc))
            q = jnp.roll(q, 1, 0) + ns[0].astype(jnp.uint32)
            return (q, t), ns

        (_, _), ns = jax.lax.scan(body, (dq, dc), None, length=REPS)
        return ns

    @jax.jit
    def pallas_loop(dq, dc):
        def body(c, _):
            q, t = c
            b1 = unpack_bits(q)
            b2 = jax.vmap(unpack_bits)(t)
            p1 = jnp.sum(b1.astype(jnp.float32), -1)
            p2 = jnp.sum(b2.astype(jnp.float32), -1)
            best, second, bidx, colarg = hamming_top2_batched(b1, p1, vq, b2, p2, vc)
            ok = (best < 1e8) & (best < 0.75 * second)
            ok &= jnp.take_along_axis(colarg, bidx, axis=1) == jnp.arange(K)[None]
            n = jnp.sum(ok, axis=1)
            q = jnp.roll(q, 1, 0) + n[0].astype(jnp.uint32)
            return (q, t), n

        (_, _), ns = jax.lax.scan(body, (dq, dc), None, length=REPS)
        return ns

    tx = timeit(xla_loop, dq, dc)
    tp = timeit(pallas_loop, dq, dc)
    print(f"batched C={C} K={K}: xla {tx:.3f} ms  pallas {tp:.3f} ms  speedup {tx/tp:.2f}x", flush=True)
    return tx, tp


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    bench_single(2048, 2048)
    bench_single(2048, 4096)  # guided-arena shape
    bench_single(512, 512)
    bench_batched(8, 2048)
    bench_batched(16, 1024)

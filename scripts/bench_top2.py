"""lax.top_k(x, 2) vs two-pass min on the (M, Kp) distance matrices of
guided/descriptor matching — top_k lowers to a full sort network on TPU;
min/argmin+masked-min is three fused VPU reductions."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 20


def timed(fn, *args, reps=3):
    @jax.jit
    def run(c0, *a):
        def body(c, _):
            return c + fn(c, *a), None
        c, _ = jax.lax.scan(body, c0, None, length=REPS)
        return c

    out = run(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(jnp.zeros(()), *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / REPS * 1e3


def top2_topk(d):
    neg2, idx2 = jax.lax.top_k(-d, 2)
    return -neg2[:, 0], -neg2[:, 1], idx2[:, 0]


def top2_min(d):
    ti = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, ti[:, None], axis=1)[:, 0]
    cols = jnp.arange(d.shape[1])
    second = jnp.min(jnp.where(cols[None, :] == ti[:, None], jnp.inf, d),
                     axis=1)
    return best, second, ti


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    for (M, Kp) in ((4096, 2048), (2048, 2048)):
        d = jnp.asarray(rng.uniform(0, 256, (M, Kp)).astype(np.float32))

        t_tk = timed(lambda c, x: 1e-9 * (
            sum(jnp.sum(v) for v in top2_topk(x + c)[:2])
            + jnp.sum(top2_topk(x + c)[2]).astype(jnp.float32)), d)
        t_mn = timed(lambda c, x: 1e-9 * (
            sum(jnp.sum(v) for v in top2_min(x + c)[:2])
            + jnp.sum(top2_min(x + c)[2]).astype(jnp.float32)), d)
        b1, s1, i1 = top2_topk(d)
        b2, s2, i2 = top2_min(d)
        same = (np.allclose(np.asarray(b1), np.asarray(b2))
                and np.allclose(np.asarray(s1), np.asarray(s2))
                and np.array_equal(np.asarray(i1), np.asarray(i2)))
        print(f"({M},{Kp}): top_k {t_tk:7.3f} ms  min-twice {t_mn:7.3f} ms  "
              f"equal={same}", flush=True)


if __name__ == "__main__":
    main()

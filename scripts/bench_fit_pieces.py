"""Bisect the vmapped pnp_dlt fit itself on TPU: after the svd/det
relowering the fit STILL costs ~2.4 ms at H=128 (q_pnp_pieces_after.log).
Candidates: the (H, 6) gathers from the (2000, .) tables, the A/AtA build,
the batched 12x12 eigh in context, the Newton polar scan."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.ops.lie import det3x3, project_to_so3_newton  # noqa: E402
from visual_slam_tpu.ops.epipolar import _sample_minimal_sets  # noqa: E402

N, H = 2000, 128
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


def build_AtA(pts3d, xy, idx):
    def one(si):
        p = pts3d[si]
        q = xy[si]
        X, Y, Z = p[:, 0], p[:, 1], p[:, 2]
        u, v = q[:, 0], q[:, 1]
        one_ = jnp.ones_like(X)
        zero = jnp.zeros_like(X)
        r1 = jnp.stack([X, Y, Z, one_, zero, zero, zero, zero,
                        -u * X, -u * Y, -u * Z, -u], axis=-1)
        r2 = jnp.stack([zero, zero, zero, zero, X, Y, Z, one_,
                        -v * X, -v * Y, -v * Z, -v], axis=-1)
        A = jnp.concatenate([r1, r2], axis=0)
        return A.T @ A

    return jax.vmap(one)(idx)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    pts3d = jnp.asarray(rng.uniform(-5, 5, (N, 3)).astype(np.float32)
                        + np.array([0, 0, 12], np.float32))
    xy = jnp.asarray(rng.normal(0, 0.3, (N, 2)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) < 0.7)
    key = jax.random.PRNGKey(0)

    t_samp = timed(lambda c, k: 1e-9 * jnp.sum(
        _sample_minimal_sets(jax.random.fold_in(k, (c * 1e12).astype(jnp.int32)),
                             mask, H, 6)).astype(jnp.float32), key)

    idx = _sample_minimal_sets(key, mask, H, 6)

    t_gather = timed(lambda c, i: 1e-9 * (jnp.sum(pts3d[i] + c)
                                          + jnp.sum(xy[i])), idx)
    t_ata = timed(lambda c, i: 1e-9 * jnp.sum(
        build_AtA(pts3d + c, xy, i)), idx)

    AtA = build_AtA(pts3d, xy, idx)
    t_eigh = timed(lambda c, a: 1e-9 * jnp.sum(
        jnp.linalg.eigh(a + c)[1][..., 0]), AtA)

    vecs = jnp.linalg.eigh(AtA)[1][..., 0]
    M3 = vecs.reshape(H, 3, 4)[:, :, :3]

    t_det = timed(lambda c, m: 1e-9 * jnp.sum(det3x3(m + c)), M3)
    t_newt = timed(lambda c, m: 1e-9 * jnp.sum(
        project_to_so3_newton(m + c)), M3)

    print(f"sample {t_samp:7.3f}  gather {t_gather:7.3f}  "
          f"AtA {t_ata:7.3f}  eigh {t_eigh:7.3f}  det {t_det:7.3f}  "
          f"newton {t_newt:7.3f}  (ms, H={H})", flush=True)


if __name__ == "__main__":
    main()

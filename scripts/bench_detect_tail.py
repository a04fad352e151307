"""Bound the achievable win of the sort-by-bin detection-tail restructure
(VERDICT r2 weak #6 / next #3) before building it: time the real rotated-
BRIEF sampling path vs a single-bin ablation (what a perfect 30x redundancy
cut would leave), scan-wrapped so relay dispatch inflation cancels
(CLAUDE.md measurement rules).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timed(fn, n=5):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from visual_slam_tpu.ops import orb
    from visual_slam_tpu.ops.detector import detect_and_describe

    print("device:", jax.devices()[0])
    K = 2000
    REPS = 20
    rng = np.random.default_rng(0)
    S = orb.sampling_matrix()
    P = S.shape[0]  # 961 or 1024 depending on the Pallas path
    patches = jnp.asarray(rng.uniform(0, 255, (K, P)).astype(np.float32))
    angles = jnp.asarray(rng.uniform(0, 2 * np.pi, K).astype(np.float32))
    S1 = S[:, : 2 * orb.N_BITS]  # single-bin ablation (961/1024 x 512)

    @jax.jit
    def full(patches, angles, S):
        def body(c, _):
            d = orb.descriptors(c.reshape(K, -1), angles, S)
            return (c + d.sum() * 0.0).astype(jnp.float32), d

        c, ds = jax.lax.scan(body, patches, None, length=REPS)
        return ds

    @jax.jit
    def single_bin(patches, S1):
        def body(c, _):
            vals = jax.lax.dot_general(
                c.reshape(K, -1), S1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ).reshape(K, orb.N_BITS, 2)
            bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
            b = bits.reshape(-1, orb.N_WORDS, 32)
            shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
            d = jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)
            return (c + d.sum() * 0.0).astype(jnp.float32), d

        c, ds = jax.lax.scan(body, patches, None, length=REPS)
        return ds

    t_full = timed(lambda: full(patches, angles, S)) / REPS
    t_one = timed(lambda: single_bin(patches, S1)) / REPS
    print(f"descriptor sampling, 30-bin full: {t_full:.3f} ms / frame-equivalent")
    print(f"descriptor sampling, 1-bin bound: {t_one:.3f} ms / frame-equivalent")
    print(f"achievable cut bound: {t_full - t_one:.3f} ms")

    # The real harvested path: bin-sorted grouped matmul (ragged_dot).
    stack = orb.sampling_stack()

    @jax.jit
    def ragged(patches, angles, stack):
        def body(c, _):
            d, order = orb.descriptors_sorted(c.reshape(K, -1), angles, stack)
            return (c + d.sum() * 0.0).astype(jnp.float32), d

        c, ds = jax.lax.scan(body, patches, None, length=REPS)
        return ds

    t_ragged = timed(lambda: ragged(patches, angles, stack)) / REPS
    print(f"descriptor sampling, ragged sorted: {t_ragged:.3f} ms / frame-equivalent")

    # Bit-equality of the ragged path on THIS backend's patch layout
    # (the CPU tests cover the 961-row layout; the TPU runs 1024-row).
    d_dense = np.asarray(orb.descriptors(patches.reshape(K, -1), angles, S))
    d_sorted, order = orb.descriptors_sorted(patches.reshape(K, -1), angles, stack)
    eq = (np.asarray(d_sorted) == d_dense[np.asarray(order)]).all()
    print(f"ragged descriptors bit-identical: {bool(eq)}")

    # Context: the whole detect+describe at the bench shape.
    H, W = 376, 1240
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))

    @jax.jit
    def det_scan(img, S):
        def body(c, _):
            f = detect_and_describe(c, num_features=2000, threshold=20.0, n_levels=4)
            return c + f.xy.sum() * 0.0, f.desc

        c, ds = jax.lax.scan(body, img, None, length=5)
        return ds

    t_det = timed(lambda: det_scan(img, S), n=3) / 5
    print(f"detect_and_describe full frame: {t_det:.3f} ms")


if __name__ == "__main__":
    main()

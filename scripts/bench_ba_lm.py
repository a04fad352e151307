"""Device A/B: reference-layout (M-major) vs landmark-MINOR dense BA.

Same honest timing as profile_ba_pieces3 (scan-wrapped back-to-back solves,
value-fetch blocked). Run on TPU:

    timeout 1800 python scripts/bench_ba_lm.py
"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from visual_slam_tpu.backend import ba  # noqa: E402
from scripts.bench_ba_sparse import make_problem  # noqa: E402
from scripts.profile_ba_pieces3 import timed_scan_solve  # noqa: E402


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    for W, M in [(16, 1024), (16, 4096), (32, 1024), (32, 4096), (64, 4096)]:
        problem, _ = make_problem(W, M, K=16)
        ms_mw, _ = timed_scan_solve(ba.bundle_adjust, problem, n_iter=20)
        ms_lm, _ = timed_scan_solve(ba.bundle_adjust_lm, problem, n_iter=20)
        # Convergence parity on the same problem.
        _, _, i1 = ba.bundle_adjust(problem, n_iter=20)
        _, _, i2 = ba.bundle_adjust_lm(problem, n_iter=20)
        print(
            f"W={W:3d} M={M:5d}: mw {ms_mw:8.2f} ms  lm {ms_lm:8.2f} ms  "
            f"speedup {ms_mw / ms_lm:5.2f}x  cost {float(i1['cost']):.3e}/"
            f"{float(i2['cost']):.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()

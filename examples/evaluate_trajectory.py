"""Trajectory evaluation CLI: ATE/RPE between two TUM-format files.

  python examples/evaluate_trajectory.py est.tum gt.tum [--no-scale]

(Evaluation tooling the reference lacks entirely, SURVEY.md §4.)
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from visual_slam_tpu.utils.metrics import ate_rmse, rpe
from visual_slam_tpu.utils.serialization import load_trajectory_tum


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association, each target used once."""
    pairs = []
    used = set()
    for i, t in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - t)))
        if abs(ts_b[j] - t) <= max_dt and j not in used:
            pairs.append((i, j))
            used.add(j)
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("estimate")
    ap.add_argument("groundtruth")
    ap.add_argument("--no-scale", action="store_true", help="disable Sim(3) scale")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--rpe-delta", type=int, default=1)
    args = ap.parse_args()

    ts_e, T_e = load_trajectory_tum(args.estimate)
    ts_g, T_g = load_trajectory_tum(args.groundtruth)
    pairs = associate(ts_e, ts_g, args.max_dt)
    if len(pairs) < 3:
        raise SystemExit(f"only {len(pairs)} associations (max_dt={args.max_dt})")
    ie = [p[0] for p in pairs]
    ig = [p[1] for p in pairs]
    c_e = T_e[ie][:, :3, 3]
    c_g = T_g[ig][:, :3, 3]
    ate = ate_rmse(c_e, c_g, align_scale=not args.no_scale)
    # RPE wants T_w2c; loaded files are T_c2w.
    rel = rpe(np.linalg.inv(T_e[ie]), np.linalg.inv(T_g[ig]), delta=args.rpe_delta)
    print(json.dumps({
        "n_poses": len(pairs),
        "ate_rmse": ate["rmse"],
        "ate_mean": ate["mean"],
        "ate_median": ate["median"],
        "scale": ate["scale"],
        "rpe_trans_rmse": rel["trans_rmse"],
        "rpe_rot_rmse_deg": rel["rot_rmse_deg"],
    }, indent=2))


if __name__ == "__main__":
    main()

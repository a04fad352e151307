"""4-arm robustness matrix for BA-numerics changes (CLAUDE.md round-3
lesson): run a marginal scenario under {dense, sparse} x {normal, reversed
landmark pack order} and report ATE for each arm. Any solver change that
claims robustness must keep all four arms under the scenario's gate —
a single-arm pass is luck (f32 near-tie accept flips), not robustness.

Usage: python scripts/robustness_matrix.py [endurance|blackout]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config
from visual_slam_tpu.slam import SLAM
from visual_slam_tpu.backend import optimizer as opt_mod
from visual_slam_tpu.utils.metrics import ate_rmse


def endurance_scenario():
    from render import render_sequence

    rng = np.random.default_rng(2)
    n = 36
    frames, Ts_gt, K, _ = render_sequence(rng, n_frames=n, step=0.28)
    cfg = Config()
    cfg.feature.num_features = 320
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 40
    cfg.tracking.keyframe_interval = 2
    cfg.tracking.kf_min_matches = 25
    cfg.optimization.window_size = 6
    cfg.optimization.ba_every_n_keyframes = 2
    cfg.map.cull_redundant_keyframes = True
    cfg.map.min_keyframes_before_cull = 6
    cfg.map.max_landmarks = 1500
    return frames, Ts_gt, K, cfg, 0.05 * 0.28 * n


def blackout_scenario():
    from render import loop_path, make_ring_world, render

    N, STEP, W, H, F = 100, 0.25, 320, 240, 260.0
    rng = np.random.default_rng(11)
    Ts = loop_path(N, step=STEP, closes=1.06)
    yaw = 2 * np.pi * 1.06 / N
    radius = STEP / (2 * np.sin(yaw / 2))
    world = make_ring_world(rng, np.array([-radius, 0.0, 0.0]), radius + 3.0, radius + 13.0)
    K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]])
    frames = []
    for i, T in enumerate(Ts):
        img = (np.full((H, W), 110.0, np.float32) if i in range(60, 63)
               else render(world, T, K, W, H))
        img = img * (1.0 + 0.05 * np.sin(2 * np.pi * i / 50.0))
        img = img + rng.normal(0, 2.0, img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.float32))
    cfg = Config()
    cfg.feature.num_features = 320
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 40
    cfg.tracking.keyframe_interval = 2
    cfg.tracking.kf_min_matches = 25
    cfg.optimization.window_size = 6
    cfg.optimization.ba_every_n_keyframes = 2
    cfg.map.cull_redundant_keyframes = True
    cfg.map.min_keyframes_before_cull = 6
    cfg.map.max_landmarks = 2500
    cfg.loop_closing.enabled = True
    return frames, Ts, K, cfg, 0.02 * STEP * N


def run_arm(frames, Ts_gt, K, cfg, sparse: bool, reverse: bool) -> float:
    cfg.optimization.sparse_obs = sparse
    orig_pack = opt_mod.LMOptimizer._pack
    orig_packs = opt_mod.LMOptimizer._pack_sparse
    if reverse:
        opt_mod.LMOptimizer._pack = lambda self, kfs, mps, w, m, ff: orig_pack(
            self, kfs, list(reversed(mps)), w, m, ff)
        opt_mod.LMOptimizer._pack_sparse = (
            lambda self, kfs, mps, w, m, ff: orig_packs(
                self, kfs, list(reversed(mps)), w, m, ff))
    try:
        cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
        slam = SLAM(cam, cfg)
        for i, img in enumerate(frames):
            slam.track([img], timestamp=i * 0.1)
        slam.shutdown()
        kfs = slam.map.get_keyframes()
        est = np.stack([np.asarray(kf.t_c2w) for kf in kfs])
        idx = [int(round(kf.timestamp / 0.1)) for kf in kfs]
        gt = np.stack([-Ts_gt[i][:3, :3].T @ Ts_gt[i][:3, 3] for i in idx])
        return float(ate_rmse(est, gt, align_scale=True)["rmse"])
    finally:
        opt_mod.LMOptimizer._pack = orig_pack
        opt_mod.LMOptimizer._pack_sparse = orig_packs


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "endurance"
    frames, Ts_gt, K, cfg, gate = (
        endurance_scenario() if which == "endurance" else blackout_scenario()
    )
    fails = 0
    for sparse in (False, True):
        for reverse in (False, True):
            ate = run_arm(frames, Ts_gt, K, cfg, sparse, reverse)
            ok = ate < gate
            fails += 0 if ok else 1
            print(
                f"{which}: sparse={sparse} reversed={reverse}: "
                f"ate={ate:.4f} gate={gate:.3f} {'PASS' if ok else 'FAIL'}",
                flush=True,
            )
    print(f"{which}: {4 - fails}/4 arms pass")


if __name__ == "__main__":
    main()

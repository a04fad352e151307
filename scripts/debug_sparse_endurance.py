"""Shadow-compare sparse vs dense BA on every real solve of the endurance
scenario: dense drives the writeback; sparse runs on the same inputs and we
print per-solve deltas to find the first divergence."""
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from render import render_sequence  # noqa: E402
from visual_slam_tpu.camera import PinholeCamera  # noqa: E402
from visual_slam_tpu.config import Config  # noqa: E402
from visual_slam_tpu.slam import SLAM  # noqa: E402
from visual_slam_tpu.backend import optimizer as opt_mod  # noqa: E402
from visual_slam_tpu.backend.ba import (  # noqa: E402
    bundle_adjust_robust,
    bundle_adjust_robust_sparse,
)

orig_start = opt_mod.LMOptimizer.solve_start
N_SOLVE = [0]


def shadow_start(self, keyframes, map_points, w_bucket, fixed_flags=None,
                 renormalize_scale=False):
    cfg = self.config.optimization
    if fixed_flags is None:
        fixed_flags = [j == 0 for j in range(len(keyframes))]
    mps = self._select_points(map_points, cfg.max_points)
    m_bucket = min(
        opt_mod._bucket4(len(mps), lo=cfg.point_bucket_floor),
        max(cfg.max_points, cfg.point_bucket_floor),
    )
    dense_p, _, _, dvalid, _ = self._pack(
        keyframes, mps, w_bucket, m_bucket, fixed_flags
    )
    sparse_p, _, _, svalid, _, _ = self._pack_sparse(
        keyframes, mps, w_bucket, m_bucket, fixed_flags
    )
    focal = float(self.camera.K[0, 0])
    n1 = max(cfg.n_iter // 2, 1)
    kw = dict(n_iter=n1, n_iter2=max(cfg.n_iter - n1, 1),
              huber=cfg.huber_delta / focal, lam0=cfg.lm_lambda0,
              trim_factor=3.0)
    Td, Xd, infod = bundle_adjust_robust(dense_p, **kw)
    Ts, Xs, infos = bundle_adjust_robust_sparse(sparse_p, **kw)
    W = len(keyframes)
    dT = float(np.max(np.abs(np.asarray(Td)[:W] - np.asarray(Ts)[:W])))
    Mr = len(mps)
    dX = float(np.max(np.abs(np.asarray(Xd)[:Mr] - np.asarray(Xs)[:Mr])))
    n_obs_d = int(dvalid.sum())
    n_obs_s = int(svalid.sum())
    N_SOLVE[0] += 1
    print(
        f"solve {N_SOLVE[0]:3d}: W={len(keyframes):2d} M={Mr:4d} "
        f"obs d/s {n_obs_d}/{n_obs_s}  "
        f"cost d/s {float(infod['cost']):.3e}/{float(infos['cost']):.3e}  "
        f"trim d/s {int(infod['n_trimmed'])}/{int(infos['n_trimmed'])}  "
        f"dT {dT:.2e} dX {dX:.2e}",
        flush=True,
    )
    # Dense drives the writeback (known-good baseline).
    return {
        "T": Td, "X": Xd, "info": infod,
        "keyframes": list(keyframes), "used_points": mps,
        "kf_slot": {kf.keyframe_id: j for j, kf in enumerate(keyframes)},
        "packed_valid": dvalid,
        "kp_of": self._pack(keyframes, mps, w_bucket, m_bucket, fixed_flags)[4],
        "obs_pose": None,
        "fixed_flags": fixed_flags, "renormalize_scale": renormalize_scale,
    }


opt_mod.LMOptimizer.solve_start = shadow_start

rng = np.random.default_rng(2)
n = 36
frames, Ts_gt, K, world = render_sequence(rng, n_frames=n, step=0.28)
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
cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0], K=K)
slam = SLAM(cam, cfg)
for i, img in enumerate(frames):
    slam.track([img], timestamp=i * 0.1)
slam.shutdown()
print("keyframes", slam.map.num_keyframes(), "points", slam.map.num_map_points())

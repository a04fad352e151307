"""AdamOptimizer facade over host map objects (reference-parity solver)."""
import numpy as np

from visual_slam_tpu.backend.adam import AdamOptimizer
from visual_slam_tpu.camera import PinholeCamera
from visual_slam_tpu.config import Config

from test_map_management import _feats
from visual_slam_tpu.map import KeyFrame, Map, MapPoint


def test_adam_facade_optimize_local(rng):
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    cam = PinholeCamera(320, 240, K)
    cfg = Config()
    cfg.optimization.solver = "adam"
    cfg.optimization.n_iter = 100
    cfg.optimization.lr = 2e-3
    m = Map()
    # Two KFs observing shared points with consistent geometry + noise.
    pts = np.stack([rng.uniform(-1, 1, 30), rng.uniform(-0.8, 0.8, 30), rng.uniform(4, 8, 30)], 1)
    kfs = []
    for k in range(2):
        T = np.eye(4)
        T[0, 3] = -0.4 * k
        kf = KeyFrame(features=[_feats(rng, 32)], timestamp=0.1 * k)
        kf.update_pose(T)
        # Write keypoints as exact projections.
        import jax.numpy as jnp

        pc = pts @ T[:3, :3].T + T[:3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
        f = kf.features[0]._replace(xy=jnp.asarray(np.vstack([uv, np.zeros((2, 2))]), jnp.float32))
        kf.features = [f]
        m.add_keyframe(kf)
        kfs.append(kf)
    mps = []
    for i in range(30):
        mp = MapPoint(pts[i] + rng.normal(0, 0.05, 3))
        for kf in kfs:
            kf.add_map_point(0, i, mp)
        m.add_map_point(mp)
        mps.append(mp)
    opt = AdamOptimizer(cfg, cam)
    before = m.compute_mean_reprojection_error(K)
    result = opt.optimize_local(kfs, mps)
    after = m.compute_mean_reprojection_error(K)
    assert result["cost"] < result["cost0"]
    assert after < before


def test_adam_facade_optimize_global(rng):
    """Regression: optimize_global routes through _solve_and_writeback with
    renormalize_scale=True — the adam facade must accept it (round-1 raised
    TypeError at the first keyframe BA with solver='adam') and re-impose the
    mono gauge (KF0->KF1 baseline preserved exactly)."""
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
    cam = PinholeCamera(320, 240, K)
    cfg = Config()
    cfg.optimization.solver = "adam"
    cfg.optimization.n_iter = 60
    cfg.optimization.lr = 2e-3
    m = Map()
    pts = np.stack(
        [rng.uniform(-1, 1, 30), rng.uniform(-0.8, 0.8, 30), rng.uniform(4, 8, 30)], 1
    )
    kfs = []
    for k in range(3):
        T = np.eye(4)
        T[0, 3] = -0.4 * k
        kf = KeyFrame(features=[_feats(rng, 32)], timestamp=0.1 * k)
        kf.update_pose(T)
        import jax.numpy as jnp

        pc = pts @ T[:3, :3].T + T[:3, 3]
        uv = (pc[:, :2] / pc[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
        f = kf.features[0]._replace(
            xy=jnp.asarray(np.vstack([uv, np.zeros((2, 2))]), jnp.float32)
        )
        kf.features = [f]
        m.add_keyframe(kf)
        kfs.append(kf)
    mps = []
    for i in range(30):
        mp = MapPoint(pts[i] + rng.normal(0, 0.05, 3))
        for kf in kfs:
            kf.add_map_point(0, i, mp)
        m.add_map_point(mp)
        mps.append(mp)
    opt = AdamOptimizer(cfg, cam)
    baseline_before = np.linalg.norm(kfs[1].t_c2w - kfs[0].t_c2w)
    result = opt.optimize_global(kfs, mps)
    assert result["cost"] < result["cost0"]
    baseline_after = np.linalg.norm(kfs[1].t_c2w - kfs[0].t_c2w)
    np.testing.assert_allclose(baseline_after, baseline_before, rtol=1e-5)

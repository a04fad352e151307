import numpy as np
import jax.numpy as jnp

from visual_slam_tpu.loop_closing.pose_graph import (
    build_sequential_graph,
    optimize_pose_graph,
)


def circle_poses(n, radius=5.0):
    """Camera driving a circle, T_w2c per step."""
    Ts = []
    for k in range(n):
        th = 2 * np.pi * k / n
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        C = np.array([radius * np.sin(th), 0.0, radius * (1 - np.cos(th))])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ C
        Ts.append(T)
    return np.stack(Ts)


def test_pose_graph_consistent_chain_stays_put():
    poses = circle_poses(12).astype(np.float32)
    graph = build_sequential_graph(poses)
    T_opt, info = optimize_pose_graph(graph, n_iter=5)
    np.testing.assert_allclose(np.asarray(T_opt), poses, atol=1e-4)


def test_pose_graph_corrects_drift_with_loop_edge(rng):
    n = 16
    gt = circle_poses(n)
    # Simulate accumulated drift: perturb relative motions slightly and
    # integrate — end pose drifts away from GT.
    drifted = [gt[0]]
    for k in range(1, n):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.eye(4)
        noise[:3, 3] = rng.normal(0, 0.03, 3)
        drifted.append(noise @ rel @ drifted[-1])
    drifted = np.stack(drifted).astype(np.float32)
    end_err_before = np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3])

    # Loop edge: node n-1 observes node 0 with the TRUE relative pose.
    T_meas = gt[-1] @ np.linalg.inv(gt[0])
    graph = build_sequential_graph(drifted, loop_edges=[(n - 1, 0, T_meas)])
    T_opt, info = optimize_pose_graph(graph, n_iter=15)
    T_opt = np.asarray(T_opt)
    # Loop constraint satisfied after optimization.
    rel_end = T_opt[-1] @ np.linalg.inv(T_opt[0])
    np.testing.assert_allclose(rel_end, T_meas, atol=5e-2)
    # Cost decreased substantially.
    assert float(info["costs"][-1]) < float(info["costs"][0]) * 0.5


def test_pose_graph_padding():
    poses = circle_poses(6).astype(np.float32)
    graph = build_sequential_graph(poses, n_slots=10, e_slots=12)
    T_opt, info = optimize_pose_graph(graph, n_iter=3)
    assert np.isfinite(np.asarray(T_opt)).all()
    np.testing.assert_allclose(np.asarray(T_opt[:6]), poses, atol=1e-3)


def test_sim3_graph_corrects_scale_drift(rng):
    """Mono scale drift: each odometry step's translation shrinks by 2%/step;
    a loop edge with the true relative pose + measured relative scale must
    de-drift the trajectory (ATE improves), not just move the end node."""
    from visual_slam_tpu.loop_closing.pose_graph import (
        build_sim3_graph,
        optimize_sim3_graph,
    )

    n = 14
    gt = circle_poses(n, radius=4.0)
    drifted = [gt[0]]
    scale = 1.0
    for k in range(1, n):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        scale *= 0.98  # 2% scale shrink per step
        rel_d = rel.copy()
        rel_d[:3, 3] *= scale
        drifted.append(rel_d @ drifted[-1])
    drifted = np.stack(drifted).astype(np.float32)

    def ate(T):
        C = np.stack([-T[k, :3, :3].T @ T[k, :3, 3] for k in range(n)])
        Cg = np.stack([-gt[k, :3, :3].T @ gt[k, :3, 3] for k in range(n)])
        return float(np.sqrt(np.mean(np.sum((C - Cg) ** 2, -1))))

    # Loop edge n-1 -> 0: true relative pose, measured relative map scale
    # (local scale at node n-1 relative to node 0 = accumulated shrink).
    T_meas = gt[-1] @ np.linalg.inv(gt[0])
    s_meas = 0.98 ** (n - 1)
    graph = build_sim3_graph(drifted, loop_edges=[(n - 1, 0, T_meas, s_meas)])
    T_opt, scales, info = optimize_sim3_graph(graph, n_iter=15)
    T_opt = np.asarray(T_opt, np.float64)
    scales = np.asarray(scales)
    assert float(info["costs"][-1]) < float(info["costs"][0]) * 0.2
    # Loop constraint satisfied.
    rel_end = T_opt[-1] @ np.linalg.inv(T_opt[0])
    np.testing.assert_allclose(rel_end[:3, :3], T_meas[:3, :3], atol=0.05)
    assert scales[0] == 1.0  # fixed gauge node
    assert np.isfinite(scales).all()
    # Node scales track the accumulated drift factor (shrinking here).
    assert scales[-1] < 0.93
    # The corrected trajectory is closer to ground truth than the drifted one.
    assert ate(T_opt) < 0.5 * ate(drifted)


def test_close_corrects_scale_drifted_map(rng):
    """Regression for the landmark-correction direction: on a synthetic
    scale-drifted loopy map, LoopClosing.close() must DECREASE cross-view
    reprojection error and ATE (the round-1 implementation multiplied
    camera-frame landmarks by the node scale and made both worse)."""
    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.loop_closing import LoopClosing
    from visual_slam_tpu.map import KeyFrame, Map, MapPoint
    from visual_slam_tpu.map.pose import Pose

    n, radius, m_pts, gamma = 16, 6.0, 200, 1.05
    angles = np.linspace(0, 2 * np.pi * 0.95, n)
    C_true = np.stack(
        [radius * np.cos(angles), 0.1 * np.sin(2 * angles), radius * np.sin(angles)], 1
    )

    def look_at(C):
        z = -C / np.linalg.norm(C)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        return np.stack([x, np.cross(z, x), z])

    R_true = np.stack([look_at(c) for c in C_true])
    T_true = np.tile(np.eye(4), (n, 1, 1))
    T_true[:, :3, :3] = R_true
    T_true[:, :3, 3] = -np.einsum("nij,nj->ni", R_true, C_true)
    X_true = rng.normal(0, 1.2, (m_pts, 3))

    # Visibility + true observations (normalized image plane).
    obs = np.zeros((n, m_pts), bool)
    uv_true = np.zeros((n, m_pts, 2))
    for k in range(n):
        xc = X_true @ R_true[k].T + T_true[k, :3, 3]
        z = xc[:, 2]
        uv = xc[:, :2] / np.maximum(z[:, None], 1e-9)
        obs[k] = (z > 2.0) & (np.abs(uv) < 0.5).all(1)
        uv_true[k] = uv

    # Drifted map: camera centers integrate scale-inflated steps; landmarks
    # live at their first observer's local (drifted) scale.
    alpha = gamma ** np.arange(n)
    C_d = C_true.copy()
    for k in range(n - 1):
        C_d[k + 1] = C_d[k] + alpha[k] * (C_true[k + 1] - C_true[k])
    T_d = T_true.copy()
    T_d[:, :3, 3] = -np.einsum("nij,nj->ni", R_true, C_d)
    first = np.array([int(np.argmax(obs[:, m])) for m in range(m_pts)])
    X_d = np.zeros_like(X_true)
    for m in range(m_pts):
        r = first[m]
        xc = R_true[r] @ X_true[m] + T_true[r, :3, 3]
        X_d[m] = R_true[r].T @ (alpha[r] * xc) + C_d[r]

    # Build the real Map.
    slam_map = Map()
    kfs = []
    for k in range(n):
        kf = KeyFrame(timestamp=float(k), pose=Pose(T_d[k]))
        slam_map.add_keyframe(kf)
        kfs.append(kf)
    for m in range(m_pts):
        mp = MapPoint(X_d[m])
        slam_map.add_map_point(mp)
        for k in np.nonzero(obs[:, m])[0]:
            mp.add_observation(kfs[k].keyframe_id, 0, m)

    def metrics():
        errs = []
        pts = {mp_.id: mp_ for mp_ in slam_map.get_map_points()}
        X = np.stack([p.position for p in pts.values()])
        order = list(pts.values())
        for k, kf in enumerate(slam_map.get_keyframes()):
            T = kf.T_w2c
            for mi, mp_ in enumerate(order):
                if not obs[k, mi]:
                    continue
                xc = T[:3, :3] @ mp_.position + T[:3, 3]
                if xc[2] < 1e-6:
                    errs.append(1.0)
                    continue
                errs.append(np.linalg.norm(xc[:2] / xc[2] - uv_true[k, mi]))
        C = np.stack([-kf.T_w2c[:3, :3].T @ kf.T_w2c[:3, 3] for kf in slam_map.get_keyframes()])
        ate = float(np.sqrt(np.mean(np.sum((C - C_true) ** 2, -1))))
        return float(np.mean(errs)), ate

    reproj0, ate0 = metrics()

    cam = PinholeCamera(width=640, height=480, K=np.array(
        [[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]))
    lc = LoopClosing(slam_map, cam, Config(), optimizer=None)
    detection = {
        "candidate": kfs[0],
        "T_kf_corrected": T_true[-1].copy(),  # PnP vs node-0-scale landmarks
        "n_inliers": 50,
        "s_meas": float(alpha[-1]),
    }
    result = lc.close(kfs[-1], detection)
    reproj1, ate1 = metrics()
    assert np.isfinite(result["pose_graph_cost"])
    assert result["covis_edges"] > 0  # essential graph, not just the chain
    # The correction must improve BOTH map consistency and the trajectory.
    assert reproj1 < 0.7 * reproj0, (reproj0, reproj1)
    assert ate1 < 0.35 * ate0, (ate0, ate1)


def test_sim3_loop_edge_scale_convention_nonzero_baseline():
    """The loop edge's measured translation must carry the s_meas factor
    (Sim(3) nodes store t = s x SE(3) translation): with 2x scale drift and
    a revisit TWO baselines from the candidate, the corrected loop node must
    land on the PnP-verified pose, not offset by (1 - 1/s) x baseline."""
    import numpy as np

    from visual_slam_tpu.loop_closing.pose_graph import (
        build_sim3_graph,
        optimize_sim3_graph,
    )

    N = 12
    gt_C = np.zeros((N, 3))
    est_C = np.zeros((N, 3))
    s_cum = np.linspace(1.0, 2.0, N)  # accumulated mono scale drift
    step = np.array([1.0, 0.0, 0.0])
    for k in range(1, N):
        d = step if k < 8 else -step  # out and back
        gt_C[k] = gt_C[k - 1] + d
        est_C[k] = est_C[k - 1] + s_cum[k] * d

    def T_of(C):
        T = np.eye(4)
        T[:3, 3] = -C
        return T

    est = np.stack([T_of(c) for c in est_C]).astype(np.float32)
    gt = np.stack([T_of(c) for c in gt_C]).astype(np.float32)
    i, j = N - 1, 1
    assert np.linalg.norm(gt_C[i] - gt_C[j]) > 1.5  # non-trivial revisit baseline
    s_meas = s_cum[i] / s_cum[j]
    T_meas = gt[i] @ np.linalg.inv(est[j])  # verification in j's gauge
    g = build_sim3_graph(est, loop_edges=[(i, j, T_meas, float(s_meas))])
    T_opt, scales, info = optimize_sim3_graph(g, n_iter=25)
    T_opt = np.asarray(T_opt)
    C_opt = np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_opt])
    err = np.linalg.norm(C_opt[i] - gt_C[i])
    assert err < 0.1, err  # pre-fix bias here was ~0.9
    assert abs(float(scales[i]) - s_meas) < 0.05

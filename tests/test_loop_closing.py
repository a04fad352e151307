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
    a loop edge with the true relative pose + scale must pull scales back."""
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

    # Loop edge n-1 -> 0 with TRUE relative pose and measured relative scale.
    T_meas = gt[-1] @ np.linalg.inv(gt[0])
    s_meas = 1.0  # true scale ratio between ends
    graph = build_sim3_graph(drifted, loop_edges=[(n - 1, 0, T_meas, s_meas)])
    T_opt, scales, info = optimize_sim3_graph(graph, n_iter=15)
    T_opt = np.asarray(T_opt)
    scales = np.asarray(scales)
    assert float(info["costs"][-1]) < float(info["costs"][0]) * 0.2
    # Loop constraint satisfied.
    rel_end = T_opt[-1] @ np.linalg.inv(T_opt[0])
    np.testing.assert_allclose(rel_end[:3, :3], T_meas[:3, :3], atol=0.05)
    # Scales spread monotonically-ish to absorb the drift (end nodes pushed up).
    assert scales[0] == 1.0  # fixed gauge node
    assert np.isfinite(scales).all()

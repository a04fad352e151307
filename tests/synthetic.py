"""Synthetic camera-rig scene generator — the 'fake camera' test fixture
replacing the reference's missing dataset (SURVEY.md §4)."""
from __future__ import annotations

import numpy as np


def default_K(f=500.0, cx=320.0, cy=240.0):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=np.float64)


def random_pose(rng, max_angle=0.3, max_trans=1.0):
    """Random SE(3) T_w2c."""
    w = rng.uniform(-1, 1, 3)
    w = w / np.linalg.norm(w) * rng.uniform(0, max_angle)
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(w).as_matrix()
    t = rng.uniform(-max_trans, max_trans, 3)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def make_scene(rng, n_pts=200, depth_range=(4.0, 20.0), K=None,
               baseline=1.0, noise_px=0.0, width=640, height=480):
    """Two-camera scene: cam1 at identity, cam2 displaced; points in front of
    both. Returns dict with K, T1, T2 (w2c), pts3d, uv1, uv2, xy1, xy2 (normalized)."""
    if K is None:
        K = default_K()
    # Points in camera-1 frustum.
    z = rng.uniform(*depth_range, n_pts)
    u = rng.uniform(40, width - 40, n_pts)
    v = rng.uniform(40, height - 40, n_pts)
    Kinv = np.linalg.inv(K)
    rays = (Kinv @ np.stack([u, v, np.ones(n_pts)])).T
    pts3d = rays * z[:, None]  # world == cam1 frame
    T1 = np.eye(4)
    # Cam2: small rotation + sideways baseline.
    from scipy.spatial.transform import Rotation

    ang = rng.uniform(-0.05, 0.05, 3)
    R2 = Rotation.from_rotvec(ang).as_matrix()
    C2 = np.array([baseline, 0.1 * baseline, 0.2 * baseline])  # camera-2 center in world
    T2 = np.eye(4)
    T2[:3, :3] = R2
    T2[:3, 3] = -R2 @ C2

    def proj(T):
        pc = pts3d @ T[:3, :3].T + T[:3, 3]
        xy = pc[:, :2] / pc[:, 2:3]
        uv = xy @ K[:2, :2].T + K[:2, 2]
        return uv, xy, pc[:, 2]

    uv1, xy1, z1 = proj(T1)
    uv2, xy2, z2 = proj(T2)
    if noise_px > 0:
        n1 = rng.normal(0, noise_px, uv1.shape)
        n2 = rng.normal(0, noise_px, uv2.shape)
        uv1 = uv1 + n1
        uv2 = uv2 + n2
        xy1 = (np.linalg.inv(K) @ np.concatenate([uv1, np.ones((n_pts, 1))], 1).T).T[:, :2]
        xy2 = (np.linalg.inv(K) @ np.concatenate([uv2, np.ones((n_pts, 1))], 1).T).T[:, :2]
    return dict(K=K, Kinv=Kinv, T1=T1, T2=T2, pts3d=pts3d,
                uv1=uv1, uv2=uv2, xy1=xy1, xy2=xy2, z1=z1, z2=z2,
                width=width, height=height)

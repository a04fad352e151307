"""Synthetic 3D world renderer for end-to-end SLAM tests: textured square
sprites at random depths, drawn with a painter's sort — enough structure for
FAST corners + BRIEF matching with genuine parallax (non-planar scene, so the
essential matrix stays well-conditioned)."""
from __future__ import annotations

import numpy as np


def make_world(rng, n_sprites=260, x_range=(-6, 14), y_range=(-4, 4), z_range=(6, 18)):
    pts = np.stack([
        rng.uniform(*x_range, n_sprites),
        rng.uniform(*y_range, n_sprites),
        rng.uniform(*z_range, n_sprites),
    ], 1)
    sizes = rng.uniform(0.12, 0.35, n_sprites)  # world-space half width
    intensities = rng.uniform(30, 255, n_sprites)
    return {"pts": pts, "sizes": sizes, "intensities": intensities}


def render_with_depth(world, T_w2c, K, width=320, height=240, bg=110.0, bg_depth=0.0):
    """Like render() but also returns a per-pixel depth map (0 = no sprite)."""
    img = render(world, T_w2c, K, width, height, bg)
    zbuf = np.full((height, width), bg_depth, np.float32)
    R, t = T_w2c[:3, :3], T_w2c[:3, 3]
    pc = world["pts"] @ R.T + t
    order = np.argsort(-pc[:, 2])
    f = K[0, 0]
    for i in order:
        x, y, z = pc[i]
        if z < 0.5:
            continue
        u = f * x / z + K[0, 2]
        v = K[1, 1] * y / z + K[1, 2]
        s = f * world["sizes"][i] / z
        if s < 0.7:
            continue
        ix0, ix1 = max(int(np.floor(u - s)), 0), min(int(np.ceil(u + s)), width)
        iy0, iy1 = max(int(np.floor(v - s)), 0), min(int(np.ceil(v + s)), height)
        if ix1 <= ix0 or iy1 <= iy0:
            continue
        zbuf[iy0:iy1, ix0:ix1] = z
    return img, zbuf


def stereo_pair(world, T_w2c, K, baseline, width=320, height=240):
    """Rectified stereo: right camera displaced +baseline along the left
    camera's x axis."""
    left = render(world, T_w2c, K, width, height)
    T_right = T_w2c.copy()
    T_right[0, 3] -= baseline  # world point x maps to x - b in right cam
    right = render(world, T_right, K, width, height)
    return left, right


def render(world, T_w2c, K, width=320, height=240, bg=110.0):
    """Anti-aliased sprite rendering: square edges at true subpixel positions
    with per-pixel coverage blending — observations are then consistent 3D
    corners across views (no size-quantization bias)."""
    img = np.full((height, width), bg, np.float32)
    R, t = T_w2c[:3, :3], T_w2c[:3, 3]
    pc = world["pts"] @ R.T + t
    order = np.argsort(-pc[:, 2])  # far first (painter's algorithm)
    f = K[0, 0]
    for i in order:
        x, y, z = pc[i]
        if z < 0.5:
            continue
        u = f * x / z + K[0, 2]
        v = K[1, 1] * y / z + K[1, 2]
        s = f * world["sizes"][i] / z  # float half-width
        if s < 0.7:
            continue
        u0, u1 = u - s, u + s
        v0, v1 = v - s, v + s
        ix0, ix1 = max(int(np.floor(u0)), 0), min(int(np.ceil(u1)), width)
        iy0, iy1 = max(int(np.floor(v0)), 0), min(int(np.ceil(v1)), height)
        if ix1 <= ix0 or iy1 <= iy0:
            continue
        xs = np.arange(ix0, ix1)
        ys = np.arange(iy0, iy1)
        cov_x = np.clip(np.minimum(u1, xs + 1) - np.maximum(u0, xs), 0.0, 1.0)
        cov_y = np.clip(np.minimum(v1, ys + 1) - np.maximum(v0, ys), 0.0, 1.0)
        cov = cov_y[:, None] * cov_x[None, :]
        region = img[iy0:iy1, ix0:ix1]
        img[iy0:iy1, ix0:ix1] = region * (1 - cov) + world["intensities"][i] * cov
    return img


def camera_path(n_frames, step=0.25, yaw_rate=0.004):
    """Forward-lateral translation with slow yaw; returns (n, 4, 4) T_w2c."""
    Ts = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        C = np.array([step * i, 0.02 * i, 0.05 * i])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = -R @ C
        Ts.append(T)
    return np.stack(Ts)


def render_sequence(rng, n_frames=12, width=320, height=240, f=260.0, step=0.25):
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    world = make_world(rng)
    Ts = camera_path(n_frames, step=step)
    frames = [render(world, T, K, width, height) for T in Ts]
    return frames, Ts, K, world

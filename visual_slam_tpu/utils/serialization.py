"""Map / trajectory serialization (checkpoint & resume).

New capability — the reference has no map or trajectory persistence at all
(SURVEY.md §5 checkpoint/resume: "none"). The SoA-style feature blocks make
the map trivially serializable to one compressed npz; trajectories export in
TUM and KITTI formats for standard evaluation tooling.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def _stack_descs(mps) -> np.ndarray:
    """Landmark descriptor table at the map's native width — 8 uint32 words
    for binary families, 128 for bitcast float families (zeros row = none).
    Guided matching and the compiled step's arena need them after resume."""
    width = 8
    for mp in mps:
        if mp.descriptor is not None:
            width = int(np.asarray(mp.descriptor).reshape(-1).shape[0])
            break
    if not mps:
        return np.zeros((0, width), np.uint32)
    rows = []
    for mp in mps:
        if mp.descriptor is None:
            rows.append(np.zeros(width, np.uint32))
        else:
            d = np.asarray(mp.descriptor, np.uint32).reshape(-1)[:width]
            rows.append(np.pad(d, (0, width - d.shape[0])))
    return np.stack(rows)


def save_map(slam_map, path: str | Path) -> None:
    """Serialize keyframes (poses, timestamps, feature blocks), landmarks,
    and the observation table into one .npz."""
    kfs = slam_map.get_keyframes()
    mps = [mp for mp in slam_map.get_map_points() if not mp.is_bad]
    mp_index = {id(mp): i for i, mp in enumerate(mps)}

    obs = []  # rows: (kf_row, cam_id, kp_idx, mp_row)
    for r, kf in enumerate(kfs):
        for (cam_id, kp_idx), mp in list(kf.map_points.items()):
            i = mp_index.get(id(mp))
            if i is not None:
                obs.append((r, cam_id, kp_idx, i))

    data = {
        "n_keyframes": np.asarray(len(kfs)),
        "kf_ids": np.asarray([kf.keyframe_id for kf in kfs], np.int64),
        "kf_frame_ids": np.asarray([kf.id for kf in kfs], np.int64),
        "kf_timestamps": np.asarray([kf.timestamp for kf in kfs], np.float64),
        "kf_poses": np.stack([kf.T_w2c for kf in kfs]) if kfs else np.zeros((0, 4, 4)),
        "mp_positions": np.stack([mp.position for mp in mps]) if mps else np.zeros((0, 3)),
        "mp_colors": np.stack([mp.color for mp in mps]) if mps else np.zeros((0, 3), np.uint8),
        # Landmark descriptors (zeros row = none): guided matching and the
        # compiled step's arena need them after resume.
        "mp_descs": _stack_descs(mps),
        "observations": np.asarray(obs, np.int64).reshape(-1, 4),
    }
    for r, kf in enumerate(kfs):
        f = kf.get_features(0)
        if f is None:
            continue
        data[f"kf{r}_xy"] = np.asarray(f.xy)
        data[f"kf{r}_response"] = np.asarray(f.response)
        data[f"kf{r}_angle"] = np.asarray(f.angle)
        data[f"kf{r}_octave"] = np.asarray(f.octave)
        data[f"kf{r}_size"] = np.asarray(f.size)
        data[f"kf{r}_desc"] = np.asarray(f.desc)
        data[f"kf{r}_valid"] = np.asarray(f.valid)
    np.savez_compressed(path, **data)


def load_map(path: str | Path):
    """Rebuild a Map (keyframes + landmarks + observation links) from npz.

    Restores the saved frame/keyframe IDS (not just poses) and advances the
    process-global id counters past the restored maxima: tracking's keyframe
    gap test compares fresh Frame ids against the restored
    last_keyframe_frame_id, so a fresh process whose counters restarted at 0
    would suppress keyframe creation until the old ids were passed, starving
    the map after resume."""
    import itertools

    import jax.numpy as jnp

    from ..map import KeyFrame, Map, MapPoint
    from ..map.frame import FrameBase
    from ..ops.detector import Features

    z = np.load(path)
    slam_map = Map()
    n = int(z["n_keyframes"])
    kfs = []
    for r in range(n):
        feats = None
        if f"kf{r}_xy" in z:
            feats = Features(
                xy=jnp.asarray(z[f"kf{r}_xy"]),
                response=jnp.asarray(z[f"kf{r}_response"]),
                angle=jnp.asarray(z[f"kf{r}_angle"]),
                octave=jnp.asarray(z[f"kf{r}_octave"]),
                size=jnp.asarray(z[f"kf{r}_size"]),
                desc=jnp.asarray(z[f"kf{r}_desc"]),
                valid=jnp.asarray(z[f"kf{r}_valid"]),
            )
        kf = KeyFrame(features=[feats] if feats is not None else [],
                      timestamp=float(z["kf_timestamps"][r]))
        kf.id = int(z["kf_frame_ids"][r])
        kf.keyframe_id = int(z["kf_ids"][r])
        kf.update_pose(z["kf_poses"][r])
        slam_map.add_keyframe(kf)
        kfs.append(kf)

    if n:
        with FrameBase._ids_lock:
            nxt = next(FrameBase._ids)
            FrameBase._ids = itertools.count(max(nxt, int(z["kf_frame_ids"].max()) + 1))
        with KeyFrame._kf_ids_lock:
            nxt = next(KeyFrame._kf_ids)
            KeyFrame._kf_ids = itertools.count(max(nxt, int(z["kf_ids"].max()) + 1))

    mps = []
    descs = z["mp_descs"] if "mp_descs" in z else None
    for i, (pos, color) in enumerate(zip(z["mp_positions"], z["mp_colors"])):
        mp = MapPoint(pos, color=color)
        if descs is not None and descs[i].any():
            mp.descriptor = descs[i]
        slam_map.add_map_point(mp)
        mps.append(mp)

    for kf_row, cam_id, kp_idx, mp_row in z["observations"]:
        kfs[int(kf_row)].add_map_point(int(cam_id), int(kp_idx), mps[int(mp_row)])
    return slam_map


def save_trajectory_tum(keyframes, path: str | Path) -> None:
    """TUM format: ``timestamp tx ty tz qx qy qz qw`` (camera-to-world)."""
    lines = []
    for kf in keyframes:
        T_c2w = np.linalg.inv(kf.T_w2c)
        t = T_c2w[:3, 3]
        q = kf.pose.inverse().quaternion()  # (w, x, y, z)
        lines.append(
            f"{kf.timestamp:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
            f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
        )
    Path(path).write_text("\n".join(lines) + "\n")


def save_trajectory_kitti(keyframes, path: str | Path) -> None:
    """KITTI format: 12 row-major entries of T_c2w[:3] per line."""
    lines = []
    for kf in keyframes:
        T_c2w = np.linalg.inv(kf.T_w2c)
        lines.append(" ".join(f"{v:.6e}" for v in T_c2w[:3].reshape(-1)))
    Path(path).write_text("\n".join(lines) + "\n")


def save_track_state(state, path: str | Path) -> None:
    """Checkpoint the compiled pipeline's device-resident TrackState."""
    import jax

    leaves, treedef = jax.tree.flatten(state)
    np.savez_compressed(path, *[np.asarray(l) for l in leaves])


def load_track_state(path: str | Path):
    """Restore a TrackState (pipeline.py) from npz."""
    import jax.numpy as jnp

    from ..ops.detector import Features
    from ..pipeline import TrackState

    z = np.load(path)
    arrays = [jnp.asarray(z[k]) for k in z.files]
    feats = Features(*arrays[:7])
    return TrackState(feats, *arrays[7:])


def load_trajectory_tum(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Returns (timestamps (N,), T_c2w (N, 4, 4))."""
    rows = np.loadtxt(str(path)).reshape(-1, 8)
    ts = rows[:, 0]
    Ts = np.zeros((len(rows), 4, 4))
    for i, (tx, ty, tz, qx, qy, qz, qw) in enumerate(rows[:, 1:]):
        n = np.linalg.norm([qw, qx, qy, qz])
        qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
        Ts[i] = np.eye(4)
        Ts[i, :3, :3] = np.array(
            [
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
                [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
                [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
            ]
        )
        Ts[i, :3, 3] = (tx, ty, tz)
    return ts, Ts

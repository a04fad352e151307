"""Compiled device-resident pipeline: tracking correctness on synthetic
frames, reference swap, state checkpointing."""
import numpy as np
import jax.numpy as jnp
import pytest

from visual_slam_tpu.ops.detector import detect_and_describe
from visual_slam_tpu.pipeline import init_track_state, make_track_step, swap_reference

from render import make_world, render, camera_path


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    world = make_world(rng)
    Ts = camera_path(6, step=0.25)
    f = 260.0
    W, H = 320, 240
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    frames = [render(world, T, K, W, H) for T in Ts]
    NF = 256
    feats0 = detect_and_describe(
        jnp.asarray(frames[0]), num_features=NF, threshold=12.0, n_levels=2, grid=4
    )
    # True landmarks per keypoint slot: ray through kp at rendered depth is
    # unknown; use nearest world sprite center distance proxy instead —
    # simpler: backproject at the TRUE depth of the nearest sprite along the
    # ray is overkill; match against world points directly:
    xy = np.asarray(feats0.xy)
    valid = np.asarray(feats0.valid)
    # Ground-truth landmark per keypoint: keypoints are sprite CORNERS, and
    # sprites are fronto-parallel planes — so the true 3D point is the
    # keypoint's ray at the nearest sprite's depth (frame 0 camera = world).
    pw = world["pts"]
    pc = pw @ Ts[0][:3, :3].T + Ts[0][:3, 3]
    uv = (pc[:, :2] / pc[:, 2:3]) @ K[:2, :2].T + K[:2, 2]
    sprite_rad_px = K[0, 0] * world["sizes"] / np.maximum(pc[:, 2], 1e-6)
    Kinv = np.linalg.inv(K)
    lm = np.zeros((NF, 3), np.float32)
    has = np.zeros(NF, bool)
    for i in np.nonzero(valid)[0]:
        d = np.abs(uv - xy[i]).max(axis=1)
        j = int(np.argmin(d - sprite_rad_px))  # inside-sprite preference
        if d[j] < sprite_rad_px[j] + 2.0 and pc[j, 2] > 0.5:
            ray = Kinv @ np.array([xy[i, 0], xy[i, 1], 1.0])
            lm[i] = ray * pc[j, 2]
            has[i] = True
    state = init_track_state(feats0, lm, has, np.eye(4))
    step = make_track_step(
        jnp.asarray(K), num_features=NF, fast_threshold=12.0, n_levels=2, grid=4,
        pnp_hypotheses=64,
    )
    return step, state, frames, Ts, K


def test_compiled_tracking_recovers_poses(setup):
    step, state, frames, Ts, K = setup
    s = state
    for i in (1, 2, 3):
        s, out = step(s, jnp.asarray(frames[i]))
        T = np.asarray(out.T_w2c)
        assert int(out.n_inliers) >= 10, i
        # fixture landmarks carry up to ~sprite-size association error;
        # SLAM-level ATE tests are the real accuracy gates
        np.testing.assert_allclose(T[:3, :3], Ts[i][:3, :3], atol=0.04)
        np.testing.assert_allclose(T[:3, 3], Ts[i][:3, 3], atol=0.25)


def test_swap_reference(setup):
    step, state, frames, Ts, K = setup
    s, out = step(state, jnp.asarray(frames[1]))
    s2 = swap_reference(s, out.features, s.ref_landmarks, s.ref_has_landmark)
    assert s2.ref_feats.xy.shape == s.ref_feats.xy.shape
    s3, out3 = step(s2, jnp.asarray(frames[2]))
    assert np.isfinite(np.asarray(out3.T_w2c)).all()


def test_track_state_checkpoint(setup, tmp_path):
    from visual_slam_tpu.utils.serialization import load_track_state, save_track_state

    step, state, frames, Ts, K = setup
    s, out = step(state, jnp.asarray(frames[1]))
    p = tmp_path / "state.npz"
    save_track_state(s, p)
    s2 = load_track_state(p)
    # resumed state must produce identical next-step output
    _, o1 = step(s, jnp.asarray(frames[2]))
    _, o2 = step(s2, jnp.asarray(frames[2]))
    np.testing.assert_allclose(np.asarray(o1.T_w2c), np.asarray(o2.T_w2c), atol=1e-6)
    assert int(o1.n_inliers) == int(o2.n_inliers)

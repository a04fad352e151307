"""Benchmark: end-to-end tracked FPS at 2000 ORB features on KITTI-sized
frames (the BASELINE.json north-star metric), full-SLAM-pipeline FPS + ATE
(BASELINE config 4), and hardened BA solve latency.

Runs on whatever backend jax selects (the driver runs it on one real TPU
chip). Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is value / 30 FPS (the north-star real-time target; the
reference publishes no numbers and is qualitatively not real-time,
BASELINE.md).

Measurement notes (see CLAUDE.md):
* BA latency is measured FIRST — the axon relay inflates per-call dispatch
  of small executables once a large one is resident. Each call gets a
  DISTINCT problem and a per-call block_until_ready; median + p90 reported.
* The fused-VO FPS cycles distinct frames with async dispatch (one program
  per frame, block at the end) — the steady-state deployment shape.
* The full-pipeline number runs CompiledSLAM end to end: init -> track ->
  keyframe promotion -> triangulation -> bucketed LM/Schur BA, host decision
  work included; ATE is Umeyama-aligned (mono gauge) vs the synthetic GT.
"""
from __future__ import annotations

import json
import time

import numpy as np


def synth_kitti_frames(n_frames=12, H=376, W=1240, f=718.856, n_sprites=900,
                       seed=0, step=0.8, baseline=0.0):
    """Sprite-world frames at KITTI resolution (see tests/render.py).
    Returns (frames, K, T_w2c ground truth); with ``baseline`` > 0 also a
    right-camera sequence (offset along camera +x, KITTI rig convention) so
    stereo disparity is REAL, not a zero-disparity stack:
    (frames, frames_right, K, Ts)."""
    rng = np.random.default_rng(seed)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]], np.float32)
    span = max(30.0, step * n_frames + 20.0)
    pts = np.stack(
        [rng.uniform(-30, 10 + span, n_sprites), rng.uniform(-8, 8, n_sprites),
         rng.uniform(8, 50, n_sprites)], 1
    )
    sizes = rng.uniform(0.15, 0.6, n_sprites)
    intens = rng.uniform(20, 255, n_sprites)

    def render(T):
        img = np.full((H, W), 110.0, np.float32)
        pc = pts @ T[:3, :3].T + T[:3, 3]
        order = np.argsort(-pc[:, 2])
        for idx in order:
            x, y, z = pc[idx]
            if z < 1.0:
                continue
            u = f * x / z + K[0, 2]
            v = f * y / z + K[1, 2]
            s = f * sizes[idx] / z
            u0, u1, v0, v1 = u - s, u + s, v - s, v + s
            ix0, ix1 = max(int(u0), 0), min(int(np.ceil(u1)), W)
            iy0, iy1 = max(int(v0), 0), min(int(np.ceil(v1)), H)
            if ix1 <= ix0 or iy1 <= iy0:
                continue
            img[iy0:iy1, ix0:ix1] = intens[idx]
        return img

    frames, frames_r, Ts = [], [], []
    for i in range(n_frames):
        T = np.eye(4)
        T[0, 3] = -step * i  # camera moving +x
        frames.append(render(T))
        Ts.append(T)
        if baseline > 0:
            Tr = T.copy()
            Tr[0, 3] -= baseline  # right camera: +baseline along camera x
            frames_r.append(render(Tr))
    if baseline > 0:
        return frames, frames_r, K, np.stack(Ts)
    return frames, K, np.stack(Ts)


def make_ba_problem(rng, K_np, Wk=10, M=4096, noise=0.05):
    import jax.numpy as jnp

    from visual_slam_tpu.backend.ba import BAProblem

    pts = np.stack(
        [rng.uniform(-20, 30, M), rng.uniform(-8, 8, M), rng.uniform(8, 50, M)], 1
    ).astype(np.float32)
    T = np.tile(np.eye(4, dtype=np.float32), (Wk, 1, 1))
    for j in range(Wk):
        T[j, 0, 3] = -0.8 * j
    uv = np.zeros((M, Wk, 2), np.float32)
    valid = np.zeros((M, Wk), bool)
    for j in range(Wk):
        pc = pts @ T[j, :3, :3].T + T[j, :3, 3]
        uv[:, j] = pc[:, :2] / np.maximum(pc[:, 2:3], 1e-6)
        valid[:, j] = pc[:, 2] > 1.0
    return BAProblem(
        T_w2c=jnp.asarray(T),
        points=jnp.asarray(pts + rng.normal(0, noise, pts.shape).astype(np.float32)),
        uv=jnp.asarray(uv),
        obs_valid=jnp.asarray(valid),
        pose_valid=jnp.ones(Wk, bool),
        pose_fixed=jnp.asarray([True] + [False] * (Wk - 1)),
    )


def bench_ba(K_np):
    """Median/p90 BA latency over DISTINCT problems, blocked per call."""
    import jax

    from visual_slam_tpu.backend.ba import bundle_adjust

    rng = np.random.default_rng(1)
    huber = 5.0 / float(K_np[0, 0])
    problems = [make_ba_problem(rng, K_np) for _ in range(8)]
    # Warmup/compile on a throwaway problem.
    Tb, _, _ = bundle_adjust(make_ba_problem(rng, K_np), n_iter=20, huber=huber)
    jax.block_until_ready(Tb)
    times = []
    for p in problems:
        t0 = time.perf_counter()
        Tb, _, _ = bundle_adjust(p, n_iter=20, huber=huber)
        jax.block_until_ready(Tb)
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    return float(np.median(times)), float(np.percentile(times, 90))


def bench_vo_step(imgs, K_np, num_features=2000):
    """Steady-state fused VO step FPS (async dispatch, distinct frames)."""
    import jax
    import jax.numpy as jnp

    from visual_slam_tpu.ops.detector import detect_and_describe
    from visual_slam_tpu.pipeline import init_track_state, make_track_step

    rng = np.random.default_rng(1)
    K = jnp.asarray(K_np)
    feats0 = detect_and_describe(imgs[0], num_features=num_features, threshold=20.0, n_levels=4)
    xy = np.asarray(feats0.xy)
    z = rng.uniform(8, 40, num_features).astype(np.float32)
    Kinv = np.linalg.inv(K_np)
    rays = np.concatenate([xy, np.ones((num_features, 1), np.float32)], 1) @ Kinv.T
    landmarks = rays * z[:, None]
    state = init_track_state(feats0, landmarks, np.asarray(feats0.valid), np.eye(4), seed=0)
    step = make_track_step(K, num_features=num_features, n_levels=4)
    state_w, out = step(state, imgs[1])
    jax.block_until_ready(out.T_w2c)
    n_iter = 60
    t0 = time.perf_counter()
    s = state
    for i in range(n_iter):
        s, out = step(s, imgs[1 + (i % (len(imgs) - 1))])
    jax.block_until_ready(out.T_w2c)
    return n_iter / (time.perf_counter() - t0)


def bench_stereo_step(K_np, num_features=2000, baseline=0.54):
    """Steady-state fused STEREO step FPS: detect both cameras + in-program
    row-gated disparity + depth-aware PnP, one dispatch per frame (KITTI
    stereo geometry: bf = 0.54 m x fx).

    The pair is a REAL shifted-camera render (disparity = f*b/z), so the
    in-step depth measurement and the depth-residual PnP branch run on live
    data; the fraction of depth-valid keypoints is returned as evidence.
    Landmarks are backprojected from the step's own measured depths so the
    tracked geometry is self-consistent."""
    import jax
    import jax.numpy as jnp

    from visual_slam_tpu.ops.detector import detect_and_describe
    from visual_slam_tpu.pipeline import init_track_state, make_track_step

    frames_l, frames_r, _, _ = synth_kitti_frames(
        n_frames=12, seed=5, step=0.5, baseline=baseline
    )
    pairs = [
        jnp.stack([jnp.asarray(l), jnp.asarray(r)])
        for l, r in zip(frames_l, frames_r)
    ]
    K = jnp.asarray(K_np)
    feats0 = detect_and_describe(
        jnp.asarray(frames_l[0]), num_features=num_features, threshold=20.0, n_levels=4
    )
    step = make_track_step(
        K, num_features=num_features, n_levels=4, stereo=True, baseline=baseline
    )
    # Warmup pass on frame 0 ALSO measures per-keypoint depth; backproject
    # those into world landmarks (identity pose) for the timed tracking.
    state = init_track_state(
        feats0,
        np.zeros((num_features, 3), np.float32),
        np.asarray(feats0.valid),
        np.eye(4),
        seed=0,
    )
    _, out0 = step(state, pairs[0])
    z = np.asarray(out0.kp_z)
    z_ok = np.asarray(out0.kp_z_valid) & np.asarray(out0.features.valid)
    xy = np.asarray(out0.features.xy)
    Kinv = np.linalg.inv(K_np)
    rays = np.concatenate([xy, np.ones((num_features, 1), np.float32)], 1) @ Kinv.T
    landmarks = rays * np.where(z_ok, z, 20.0)[:, None]
    state = init_track_state(
        feats0, landmarks, z_ok, np.eye(4), seed=0
    )
    state_w, out = step(state, pairs[1])
    jax.block_until_ready(out.T_w2c)
    n_iter = 60
    t0 = time.perf_counter()
    s = state
    for i in range(n_iter):
        s, out = step(s, pairs[1 + (i % (len(pairs) - 1))])
    jax.block_until_ready(out.T_w2c)
    fps = n_iter / (time.perf_counter() - t0)
    return fps, float(z_ok.mean()), int(np.asarray(out.n_inliers))


def bench_full_pipeline(num_features=2000, n_frames=64, frame_kw=None,
                        chunk_size=8):
    """CompiledSLAM end to end on a KITTI-sized synthetic sequence: FPS with
    all host decision/keyframe/BA work included, plus mono-aligned ATE.

    Deployment shape: chunked device-side tracking (chunk_size frames per
    dispatch, pipeline.make_track_chunk). The timed window starts after two
    chunks of steady state so one-time-per-deployment compiles (chunk scan,
    triangulation, the single BA shape bucket) are warm — and it contains
    tracking, decisions, keyframe promotion, triangulation and BA, but NOT
    trajectory materialization (an end-of-run export, not per-frame work;
    VERDICT r2 weak #1).

    Frames stay float32: the sprite world's texture lives entirely in
    anti-aliased EDGE pixels, and uint8 rounding there measurably destroys
    BRIEF match stability (A/B: chunk=4 u8 went LOST at 16%% ATE where f32
    tracked 64/64 frames at 1.0%%). Real camera uint8 input is supported
    (the detector casts on device) — this is a renderer artifact, not an
    input-format policy."""
    import jax

    from visual_slam_tpu.camera import PinholeCamera
    from visual_slam_tpu.config import Config
    from visual_slam_tpu.models import CompiledSLAM
    from visual_slam_tpu.utils.metrics import ate_rmse

    kw = dict(step=0.6, n_sprites=1500)
    kw.update(frame_kw or {})
    frames, K_np, Ts_gt = synth_kitti_frames(n_frames=n_frames, seed=3, **kw)
    cfg = Config()
    cfg.feature.num_features = num_features
    cfg.tracking.keyframe_interval = 4
    cfg.tracking.chunk_size = chunk_size
    # Measured-best deployment shape (scripts/run_fullpipe_tpu.py ladder):
    # device-side in-chunk keyframe promotion, heavy (BA) boundary every
    # 2nd promotion, f16 frame upload, ONE BA bucket for the whole run
    # (window 16, pose floor 32, point floor 4096 — each extra bucket is a
    # 7-13 s compile inside the timed window).
    cfg.tracking.device_promotion = True
    cfg.tracking.heavy_boundary_every = 2
    cfg.tracking.upload_f16 = True
    cfg.optimization.max_points = 4096
    cfg.optimization.window_size = 16
    cfg.optimization.pose_bucket_floor = 32
    cfg.optimization.point_bucket_floor = 4096
    cfg.initialization.min_inliers = min(100, max(30, num_features // 20))
    cam = PinholeCamera(width=frames[0].shape[1], height=frames[0].shape[0],
                        K=np.asarray(K_np, np.float64))
    slam = CompiledSLAM(cam, cfg)

    # Bootstrap + compile outside the timed window (compiles are a one-time
    # per-deployment cost; the metric is steady-state sensor-rate capacity).
    i = 0
    while slam.state.name != "OK" and i < 6:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1
    if slam.state.name != "OK":
        return None
    # Warm through TWO full heavy-boundary cycles so every shape (chunk
    # scan, compaction, the single BA bucket) compiles before the timer —
    # and align the timed span to the chunk size: flush() runs inside the
    # timed window (it is real tail work), and a partial tail chunk would
    # compile a FRESH scan shape there (observed 11-13 s).
    n_end = len(frames) - (len(frames) - i) % chunk_size
    warm_end = min(
        i + 2 * max(chunk_size, 4) * cfg.tracking.heavy_boundary_every + 1,
        n_end - 2 * max(chunk_size, 8),
    )
    while i < warm_end:
        slam.track([frames[i]], timestamp=i * 0.1)
        i += 1

    t0 = time.perf_counter()
    n_timed = 0
    for k in range(i, n_end):
        slam.track([frames[k]], timestamp=k * 0.1)
        n_timed += 1
    slam.flush()
    dt = time.perf_counter() - t0
    fps = n_timed / dt
    ts, Ts = slam.trajectory()  # end-of-run export, not in the FPS window

    idx = [int(round(t / 0.1)) for t in ts]
    est = np.stack([-T[:3, :3].T @ T[:3, 3] for T in Ts])
    gt = np.stack([-Ts_gt[j][:3, :3].T @ Ts_gt[j][:3, 3] for j in idx])
    res = ate_rmse(est, gt, align_scale=True)
    path_len = float(np.linalg.norm(np.diff(gt, axis=0), axis=1).sum())
    return {
        "fps": round(fps, 2),
        "ate_rmse": round(float(res["rmse"]), 4),
        "ate_pct_of_path": round(100.0 * float(res["rmse"]) / max(path_len, 1e-9), 3),
        "frames_timed": n_timed,
        "keyframes": slam.map.num_keyframes(),
        "landmarks": slam.map.num_map_points(),
    }


def main():
    import jax

    num_features = 2000
    frames, K_np, _ = synth_kitti_frames()
    import jax.numpy as jnp

    imgs = [jnp.asarray(f) for f in frames]

    # BA first (relay dispatch inflation, see module docstring).
    ba_med, ba_p90 = bench_ba(K_np)
    fps = bench_vo_step(imgs, K_np, num_features)
    fps_stereo, z_frac, stereo_inl = bench_stereo_step(K_np, num_features)
    full = bench_full_pipeline(num_features)

    extra = {
        "ba_ms_median_10kf_4096pts_20iter": round(ba_med, 3),
        "ba_ms_p90": round(ba_p90, 3),
        "stereo_tracked_fps": round(fps_stereo, 2),
        "stereo_kp_z_valid_frac": round(z_frac, 3),
        "stereo_n_inliers": stereo_inl,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    if full is not None:
        extra["full_pipeline_fps"] = full["fps"]
        extra["full_pipeline_ate_pct_of_path"] = full["ate_pct_of_path"]
        extra["full_pipeline_keyframes"] = full["keyframes"]
        extra["full_pipeline_landmarks"] = full["landmarks"]

    print(
        json.dumps(
            {
                "metric": "tracked_fps_2000feat_kitti",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()

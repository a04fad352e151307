"""Guided-matching ablation at bench shapes (VERDICT r4 #8): guided is the
dominant track-step piece (3.06 ms vs match 0.41, q_track_pieces_v2.log).
Arms build up the pipeline stage by stage, plus candidate relowerings:

  dist        (M,Kp) Hamming distance matrix alone
  +gate_bcast current spatial gate: sum((uv[:,None]-kp)**2, -1)
  +gate_unroll explicit du*du+dv*dv (no (M,Kp,2) intermediate)
  +min2       row best/second/argmin
  full        shipped guided_match
  full_enc    encoded one-pass inversion (binary Hamming is integer-exact:
              min over enc = d*M + lm_idx gives per-kp winner AND tie-break
              in ONE (M,Kp) pass instead of two one-hot masked mins)

Honest timing: N back-to-back dispatches, ONE value fetch from the last
output (the scan harness adds ~400 ms one-time in-program cost at M=4096 —
CLAUDE.md round-5 lessons).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
import bench  # noqa: E402
from visual_slam_tpu.ops import matching as m_ops  # noqa: E402
from visual_slam_tpu.ops.guided_matching import guided_match  # noqa: E402
from visual_slam_tpu.ops.matching import BIG, distance_matrix, min2  # noqa: E402
from visual_slam_tpu.ops.projection import project_points  # noqa: E402

Kp = 2000
M = 4000
N_DISPATCH = 30


def timed_dispatch(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.asarray(out).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(N_DISPATCH):
            out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])  # value fetch = honest barrier
        ts.append((time.perf_counter() - t0) / N_DISPATCH * 1e3)
    return min(ts)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    frames, K_np, _ = bench.synth_kitti_frames(n_frames=2, seed=3)
    from visual_slam_tpu.ops.detector import detect_and_describe

    feats = detect_and_describe(jnp.asarray(frames[0]), num_features=Kp,
                                threshold=20.0, n_levels=4)
    kp_xy = feats.xy
    kp_desc = feats.desc
    kp_valid = feats.valid
    lm_desc = jnp.asarray(
        rng.integers(0, 2**32, (M, 8), dtype=np.uint64).astype(np.uint32)
    )
    lm_pos = jnp.asarray(
        rng.uniform(-5, 5, (M, 3)).astype(np.float32)
        + np.array([0, 0, 12], np.float32)
    )
    lm_valid = jnp.ones(M, bool)
    T = jnp.eye(4, dtype=jnp.float32)
    K = jnp.asarray(K_np, jnp.float32)
    W, H = float(frames[0].shape[1]), float(frames[0].shape[0])
    R = 15.0

    @jax.jit
    def arm_dist(ld, kd, lv, kv):
        return distance_matrix(ld, kd, lv, kv).sum()

    @jax.jit
    def arm_gate_bcast(lp, ld, lv, t, k, kxy, kd, kv):
        uv, z = project_points(k, t, lp)
        visible = lv & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        dist = distance_matrix(ld, kd, visible, kv)
        d2 = jnp.sum((uv[:, None, :] - kxy[None, :, :]) ** 2, axis=-1)
        return jnp.where(d2 <= R * R, dist, BIG).sum()

    @jax.jit
    def arm_gate_unroll(lp, ld, lv, t, k, kxy, kd, kv):
        uv, z = project_points(k, t, lp)
        visible = lv & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        dist = distance_matrix(ld, kd, visible, kv)
        du = uv[:, 0][:, None] - kxy[:, 0][None, :]
        dv = uv[:, 1][:, None] - kxy[:, 1][None, :]
        d2 = du * du + dv * dv
        return jnp.where(d2 <= R * R, dist, BIG).sum()

    @jax.jit
    def arm_min2(lp, ld, lv, t, k, kxy, kd, kv):
        uv, z = project_points(k, t, lp)
        visible = lv & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        dist = distance_matrix(ld, kd, visible, kv)
        du = uv[:, 0][:, None] - kxy[:, 0][None, :]
        dv = uv[:, 1][:, None] - kxy[:, 1][None, :]
        d2 = du * du + dv * dv
        dist = jnp.where(d2 <= R * R, dist, BIG)
        best, second, kp_of_lm = min2(dist)
        return best.sum() + second.sum() + kp_of_lm.sum()

    @jax.jit
    def arm_full(lp, ld, lv, t, k, kxy, kd, kv):
        g = guided_match(lp, ld, lv, t, k, kxy, kd, kv, W, H, radius_px=R)
        return g["n_matches"].astype(jnp.float32) + g["pts3d"].sum() * 1e-9

    @jax.jit
    def arm_full_enc(lp, ld, lv, t, k, kxy, kd, kv):
        uv, z = project_points(k, t, lp)
        visible = lv & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        dist = distance_matrix(ld, kd, visible, kv)
        du = uv[:, 0][:, None] - kxy[:, 0][None, :]
        dv = uv[:, 1][:, None] - kxy[:, 1][None, :]
        d2 = du * du + dv * dv
        dist = jnp.where(d2 <= R * R, dist, BIG)
        best, second, kp_of_lm = min2(dist)
        ok_lm = (best < BIG * 0.5) & (best <= 80.0) & (best < 0.8 * second)
        mi = jnp.arange(M)
        # Hamming distances are exact small ints: enc = d*M + lm orders by
        # (distance, landmark id) — winner + tie-break in one masked min.
        enc = jnp.where(ok_lm, best.astype(jnp.int32) * M + mi, 1 << 30)
        onehot = kp_of_lm[:, None] == jnp.arange(Kp)[None, :]
        enc_per_kp = jnp.min(jnp.where(onehot, enc[:, None], 1 << 30), axis=0)
        valid = enc_per_kp < (1 << 30)
        lm_idx = jnp.where(valid, enc_per_kp % M, 0).astype(jnp.int32)
        pts3d = lp[lm_idx]
        return (valid & kv).sum().astype(jnp.float32) + pts3d.sum() * 1e-9

    from visual_slam_tpu.ops.orb import unpack_bits
    from visual_slam_tpu.ops.pallas_kernels import guided_top2_pallas

    @jax.jit
    def arm_full_pallas(lp, ld, lv, t, k, kxy, kd, kv):
        uv, z = project_points(k, t, lp)
        visible = lv & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        b1 = unpack_bits(ld)
        b2 = unpack_bits(kd)
        lm_idx, valid = guided_top2_pallas(
            b1, jnp.sum(b1.astype(jnp.float32), -1), visible, uv,
            b2, jnp.sum(b2.astype(jnp.float32), -1), kv, kxy,
            jnp.float32(R), ratio=0.8, max_distance=80.0,
        )
        valid = valid & kv
        pts3d = lp[jnp.where(valid, lm_idx, 0)]
        return valid.sum().astype(jnp.float32) + pts3d.sum() * 1e-9

    args8 = (lm_pos, lm_desc, lm_valid, T, K, kp_xy, kp_desc, kp_valid)
    print(f"shapes: M={M} Kp={Kp}", flush=True)
    print(f"dist         {timed_dispatch(arm_dist, lm_desc, kp_desc, lm_valid, kp_valid):7.3f} ms", flush=True)
    print(f"+gate_bcast  {timed_dispatch(arm_gate_bcast, *args8):7.3f} ms", flush=True)
    print(f"+gate_unroll {timed_dispatch(arm_gate_unroll, *args8):7.3f} ms", flush=True)
    print(f"+min2        {timed_dispatch(arm_min2, *args8):7.3f} ms", flush=True)
    print(f"full(routed) {timed_dispatch(arm_full, *args8):7.3f} ms", flush=True)
    print(f"full_enc     {timed_dispatch(arm_full_enc, *args8):7.3f} ms", flush=True)
    print(f"full_pallas  {timed_dispatch(arm_full_pallas, *args8):7.3f} ms", flush=True)

    # Parity on DEVICE (not interpret): shipped guided_match (now routed to
    # the kernel on TPU) vs the XLA enc reconstruction.
    g = jax.device_get(guided_match(*args8, W, H, radius_px=R))
    uv, z = project_points(K, T, lm_pos)
    visible = lm_valid & (z > 0.1) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
        & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    dist = distance_matrix(lm_desc, kp_desc, visible, kp_valid)
    du = uv[:, 0][:, None] - kp_xy[:, 0][None, :]
    dv = uv[:, 1][:, None] - kp_xy[:, 1][None, :]
    dist = jnp.where(du * du + dv * dv <= R * R, dist, BIG)
    best, second, kp_of_lm = min2(dist)
    ok_lm = (best < BIG * 0.5) & (best <= 80.0) & (best < 0.8 * second)
    enc = jnp.where(ok_lm, best.astype(jnp.int32) * M + jnp.arange(M), 1 << 30)
    onehot = kp_of_lm[:, None] == jnp.arange(Kp)[None, :]
    enc_kp = jnp.min(jnp.where(onehot, enc[:, None], 1 << 30), axis=0)
    v_ref = np.asarray((enc_kp < (1 << 30)) & kp_valid)
    i_ref = np.asarray(jnp.where(enc_kp < (1 << 30), enc_kp % M, 0))
    agree_v = (np.asarray(g["valid"]) == v_ref).mean()
    agree_i = (np.asarray(g["lm_idx"])[v_ref] == i_ref[v_ref]).mean() if v_ref.any() else 1.0
    print(f"n_matches shipped: {int(g['n_matches'])}  valid agree {agree_v:.4f}  idx agree {agree_i:.4f}", flush=True)


if __name__ == "__main__":
    main()

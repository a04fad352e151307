"""Sequence-scale ladder, round 2: same arms as ladder_long_quality but with
the fused guided-match Pallas kernel routed (ops/guided_matching.py ->
guided_top2_pallas) — round 1 measured budget2048 31.23 fps @ 3.81% (evicts
too hard, drifts) vs budget4096 22.26 fps @ 0.506% (accurate, slow); guided
was 3.06 ms of the 4.83 ms track step at M=4096, so the kernel should move
the 4096 arms most. budget3072 probes the eviction/accuracy middle at the
same compiled shapes as 4096."""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

ARMS = [
    ("k_budget4096_mf4096", dict(max_landmarks=4096, point_floor=4096)),
    ("k_budget3072_mf4096", dict(max_landmarks=3072, point_floor=4096)),
    ("k_budget2048", dict(max_landmarks=2048)),
    # protect_recent 16 >= the BA window: round-1's budget2048 drifted 3.81%
    # — eviction (protect 8) can drop landmarks still anchoring window KFs
    # 9..16, un-anchoring every windowed solve's older poses.
    ("k_budget2048_protect16", dict(max_landmarks=2048, protect_recent=16)),
]


def main():
    for tag, kw in ARMS:
        t0 = time.time()
        try:
            out = bench.bench_full_pipeline(
                2000, n_frames=256,
                frame_kw={"n_sprites": 3400, "stratified": True}, **kw
            )
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        out["_sec"] = round(time.time() - t0, 1)
        print(f"{tag}: {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()

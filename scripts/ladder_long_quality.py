"""ATE-vs-cost ladder at sequence scale (VERDICT r4 #7): with the dense-BA
M-cliff fixed (W32/M4096 99 -> 17 ms, q_ba_honest.log) the 2048-point budget
that dodged the cliff is no longer forced — spend the reclaimed solve budget
on map capacity / iterations / window and measure what ATE it buys over 256
frames. Arms sharing shapes reuse the compile cache."""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

ARMS = [
    ("budget2048", dict(max_landmarks=2048)),
    ("budget4096_mf4096", dict(max_landmarks=4096, point_floor=4096)),
    ("budget4096_mf4096_ni12", dict(max_landmarks=4096, point_floor=4096,
                                    ba_n_iter=12)),
    ("budget4096_mf4096_w32", dict(max_landmarks=4096, point_floor=4096,
                                   window_size=32)),
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

"""Session-5 decision ladder.

1. heavy_boundary_every=3 at SEQUENCE SCALE: the short-run sample
   (q_ladder_short_recovery.log heavy3: 40.43 fps @ 0.497%) is one data
   point below the first shape boundary; before flipping the bench
   default it must hold over 256 frames with the landmark budget active
   (same bar VERDICT r4 #1 set for the 30-fps claim itself). h2_long is
   the in-process repeat of the shipped default (30.67 fps,
   q_ladder_long_quality2.log) so the A/B shares every compile.
2. Loop endurance device transfer (VERDICT r4 #6 tail): the 320-feature
   CPU scenario closed nothing under TPU numerics
   (q_loop_endurance_device.log: 0 closures, both arms 4.34%). Ladder
   num_features — the KITTI-res drift ladder closed at nf640
   (q_ladder_loop_drift.log) — to find a transferring config for the
   bench surface.
"""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

LONG_KW = dict(
    n_frames=256, frame_kw={"n_sprites": 3400, "stratified": True},
    max_landmarks=3072, point_floor=4096,
)

ARMS = [
    ("h3_long", bench.bench_full_pipeline,
     dict(LONG_KW, heavy_every=3)),
    ("h2_long_repeat", bench.bench_full_pipeline, dict(LONG_KW)),
    ("h3_short", bench.bench_full_pipeline, dict(heavy_every=3)),
    ("h3_short_repeat", bench.bench_full_pipeline, dict(heavy_every=3)),
    ("le_nf640", bench.bench_loop_endurance_device,
     dict(num_features=640)),
    ("le_nf640_noblackout", bench.bench_loop_endurance_device,
     dict(num_features=640, blackout=False)),
]


def main():
    for tag, fn, kw in ARMS:
        t0 = time.time()
        try:
            out = fn(2000, **kw) if fn is bench.bench_full_pipeline else fn(**kw)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        out["_sec"] = round(time.time() - t0, 1)
        print(f"{tag}: {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()

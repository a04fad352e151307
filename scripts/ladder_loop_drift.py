"""Device ladder for the loop-pipeline bench (VERDICT r4 #6): find the
photometric-stress / feature-count point where loop-OFF drifts visibly (the
CPU endurance split is 1.08%% vs 8.30%%) while the ON arm stays accurate —
the unstressed KITTI-res ring tracked at ~0.1%% either way
(bench_1787155464), leaving the closure nothing to demonstrate.

Arms sharing num_features share every compiled shape (the compile cache
makes arm 2+ cheap); a new feature count recompiles the world (~minutes).
"""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

ARMS = [
    # (tag, kwargs)
    ("nf2000_noise2", dict(num_features=2000, noise=2.0, bright=0.05)),
    ("nf2000_noise5", dict(num_features=2000, noise=5.0, bright=0.08)),
    ("nf640_noise2", dict(num_features=640, noise=2.0, bright=0.05)),
]


def main():
    for tag, kw in ARMS:
        t0 = time.time()
        try:
            out = bench.bench_loop_pipeline(n_frames=200, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        out["_sec"] = round(time.time() - t0, 1)
        print(f"{tag}: {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()

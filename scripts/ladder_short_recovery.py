"""Headline short-run (64-frame) ladder: bench_1787155464 measured 27.05
fps @ 1.066%% vs r4's 30.35 @ 0.794%% on the same config — either run luck
re-rolled by the dense-BA relowering (a77f5ca changes f32 summation order)
or a real regression. With the M-cliff dead (W32/M4096 99 -> 17 ms,
q_ba_honest.log) the heavy-boundary BA is ~6x cheaper, so also probe
spending LESS often (heavy_every 3) and fewer LM iterations at the same
accuracy. Arms share every compiled shape except where noted."""
import json
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402

ARMS = [
    ("rc_default", dict()),
    ("rc_repeat", dict()),  # run-to-run spread at the same config
    ("heavy3", dict(heavy_every=3)),
    ("ni8", dict(ba_n_iter=8)),
]


def main():
    for tag, kw in ARMS:
        t0 = time.time()
        try:
            out = bench.bench_full_pipeline(2000, n_frames=64, **kw)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        out["_sec"] = round(time.time() - t0, 1)
        print(f"{tag}: {json.dumps(out)}", flush=True)


if __name__ == "__main__":
    main()

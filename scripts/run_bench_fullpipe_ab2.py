"""Bench-timing A/B round 2 (post point-floor flip): at mf2048 the BA
solve is off the critical path, so the async heavy boundary — which lost
at mf4096 because the deferred solve's COMPUTE landed in the next chunk's
wait — may now win by hiding only the ~40 ms fetch RT. pnp64 halves the
RANSAC hypothesis batch (chunk ablation: -6 ms/chunk compute)."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench

for tag, kw in (
    ("asyncb", dict(async_ba=True)),
    ("pnp64", dict(pnp_hypotheses=64)),
    ("asyncb_pnp64", dict(async_ba=True, pnp_hypotheses=64)),
):
    try:
        r = bench.bench_full_pipeline(**kw)
    except Exception as e:  # noqa: BLE001 - keep later arms alive
        r = {"error": repr(e)}
    print("RESULT", json.dumps({"arm": tag, **(r or {})}), flush=True)

"""Run bench.bench_full_pipeline (the driver's metric of record) for the
ladder's finalist configs: mf2048 with n_iter 12 vs 20. Each run is a fresh
CompiledSLAM in this one process (shapes shared -> compile cache warm)."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench

for n_iter in (12, 20):
    r = bench.bench_full_pipeline(ba_n_iter=n_iter, point_floor=2048)
    print("RESULT", json.dumps({"ba_n_iter": n_iter, **(r or {})}), flush=True)

"""Run the SLAM pipeline on an image-directory dataset (KITTI-style layout).

Usage:
  python examples/run_dataset.py <image_dir> [calib_file] [--frames N]
    [--features N] [--native-loader] [--out-dir results/]

Equivalent of the reference's Processing entry (processinng.py) + the
VisualOdometry notebook workload, with trajectory/map export and profiling
the reference lacks.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from visual_slam_tpu.config import Config
from visual_slam_tpu.processing import Processing
from visual_slam_tpu.utils.serialization import (
    save_map,
    save_trajectory_kitti,
    save_trajectory_tum,
)
from visual_slam_tpu.viz import MapVisualizer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("calib", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--native-loader", action="store_true")
    ap.add_argument("--out-dir", default="results")
    args = ap.parse_args()

    cfg = Config()
    cfg.feature.num_features = args.features

    source = args.image_dir
    if args.native_loader:
        from visual_slam_tpu.io.native import NativeDatasetSource

        source = NativeDatasetSource(args.image_dir, fps=cfg.camera.fps)

    proc = Processing(source, args.calib, cfg)
    result = proc.run(max_cycles=args.frames)
    print(result)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    kfs = proc.slam.map.get_keyframes()
    save_trajectory_tum(kfs, out / "trajectory_tum.txt")
    save_trajectory_kitti(kfs, out / "trajectory_kitti.txt")
    save_map(proc.slam.map, out / "map.npz")
    MapVisualizer().save_ply(proc.slam.map, out / "map.ply")
    print(f"exported trajectory + map to {out}/")


if __name__ == "__main__":
    main()

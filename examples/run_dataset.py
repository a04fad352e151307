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

# --cpu must take effect BEFORE the package imports: module-level device
# constants (e.g. the BRIEF sampling matrix) initialize the backend at
# import time, after which the platform cannot change.
if "--cpu" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

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
    ap.add_argument("--levels", type=int, default=None, help="pyramid levels")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    cfg = Config()
    cfg.feature.num_features = args.features
    if args.levels:
        cfg.feature.num_pyramid_levels = args.levels
    # Initialization inlier demand must scale with the feature budget (the
    # default 100 is tuned for 2000 features; at --features 256 it could
    # never be met and the system would sit in INITIALIZING forever).
    cfg.initialization.min_inliers = min(
        cfg.initialization.min_inliers, max(30, args.features // 8)
    )

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

"""Processing harness integration: dataset dir + calibration -> SLAM run."""
import numpy as np
import pytest

from visual_slam_tpu.config import Config
from visual_slam_tpu.processing import Processing

from render import render_sequence


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(4)
    frames, Ts_gt, K, world = render_sequence(rng, n_frames=8, step=0.35)
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"{i:06d}.png"), f.astype(np.uint8))
    # KITTI-style calib
    (d / "calib.txt").write_text(
        f"P0: {K[0,0]} 0 {K[0,2]} 0 0 {K[1,1]} {K[1,2]} 0 0 0 1 0\n"
    )
    return d


def _cfg():
    cfg = Config()
    cfg.feature.num_features = 384
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 40
    cfg.tracking.keyframe_interval = 2
    cfg.optimization.window_size = 8
    return cfg


def test_processing_runs_with_calibration(dataset_dir):
    proc = Processing(dataset_dir, dataset_dir / "calib.txt", _cfg())
    result = proc.run()
    assert result["frames"] == 8
    assert result["state"] == "OK"
    assert result["keyframes"] >= 2
    assert result["map_points"] > 50


def test_processing_native_loader(dataset_dir):
    from visual_slam_tpu.io.native import NativeDatasetSource

    src = NativeDatasetSource(dataset_dir, fps=10.0)
    proc = Processing(src, dataset_dir / "calib.txt", _cfg())
    result = proc.run(max_cycles=5)
    assert result["frames"] == 5
    src.release()

"""Processing over standard dataset layouts (KITTI-style dir with stereo
calibration picked up automatically)."""
import numpy as np

from visual_slam_tpu.config import Config
from visual_slam_tpu.processing import Processing

from render import render_sequence


def test_processing_kitti_layout(tmp_path, rng):
    import cv2

    frames, Ts_gt, K, world = render_sequence(np.random.default_rng(4), n_frames=6, step=0.35)
    (tmp_path / "image_0").mkdir()
    for i, f in enumerate(frames):
        cv2.imwrite(str(tmp_path / "image_0" / f"{i:06d}.png"), f.astype(np.uint8))
    (tmp_path / "times.txt").write_text("".join(f"{0.1*i:.6f}\n" for i in range(6)))
    (tmp_path / "calib.txt").write_text(
        f"P0: {K[0,0]} 0 {K[0,2]} 0 0 {K[1,1]} {K[1,2]} 0 0 0 1 0\n"
    )
    cfg = Config()
    cfg.feature.num_features = 384
    cfg.feature.num_pyramid_levels = 2
    cfg.feature.fast_threshold = 12.0
    cfg.feature.grid_cells = 4
    cfg.initialization.min_inliers = 40
    proc = Processing(tmp_path, None, cfg)  # calibration from the layout
    assert proc.camera.fx == K[0, 0]
    result = proc.run()
    assert result["frames"] == 6
    assert result["keyframes"] >= 2

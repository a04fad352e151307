import numpy as np
import pytest

from visual_slam_tpu.config import Config
from visual_slam_tpu.io.calibration import UniversalCalibration
from visual_slam_tpu.io.source import DatasetSource
from visual_slam_tpu.camera import PinholeCamera


def test_kitti_calibration(tmp_path):
    # KITTI odometry calib.txt: P0/P1 rows (rectified projective matrices).
    f, cx, cy, b = 718.856, 607.1928, 185.2157, 0.537
    p0 = f"P0: {f} 0 {cx} 0 0 {f} {cy} 0 0 0 1 0"
    p1 = f"P1: {f} 0 {cx} {-f * b} 0 {f} {cy} 0 0 0 1 0"
    path = tmp_path / "calib.txt"
    path.write_text(p0 + "\n" + p1 + "\n")
    calib = UniversalCalibration().load_from(path)
    np.testing.assert_allclose(calib.mono.K[0, 0], f)
    np.testing.assert_allclose(calib.mono.K[0, 2], cx)
    assert calib.stereo is not None
    np.testing.assert_allclose(calib.stereo.baseline, b, rtol=1e-6)


def test_ros_yaml_calibration(tmp_path):
    text = """
image_width: 640
image_height: 480
camera_matrix:
  rows: 3
  cols: 3
  data: [500.0, 0.0, 320.0, 0.0, 501.0, 240.0, 0.0, 0.0, 1.0]
distortion_coefficients:
  rows: 1
  cols: 5
  data: [-0.3, 0.1, 0.001, -0.001, 0.05]
"""
    path = tmp_path / "cam.yaml"
    path.write_text(text)
    calib = UniversalCalibration().load_from(path)
    np.testing.assert_allclose(calib.mono.K[1, 1], 501.0)
    np.testing.assert_allclose(calib.mono.D[0], -0.3)
    assert calib.mono.width == 640


def test_kalibr_calibration(tmp_path):
    text = """
cam0:
  camera_model: pinhole
  intrinsics: [458.654, 457.296, 367.215, 248.375]
  distortion_model: radtan
  distortion_coeffs: [-0.28, 0.07, 0.0002, 0.00002]
  resolution: [752, 480]
cam1:
  camera_model: pinhole
  intrinsics: [457.587, 456.134, 379.999, 255.238]
  distortion_coeffs: [-0.28, 0.07, -0.0001, -0.00005]
  resolution: [752, 480]
  T_cn_cnm1:
  - [0.9999, 0.002, 0.0008, -0.110]
  - [-0.002, 0.9999, 0.0002, 0.0004]
  - [-0.0008, -0.0002, 1.0, -0.0006]
  - [0.0, 0.0, 0.0, 1.0]
"""
    path = tmp_path / "camchain.yaml"
    path.write_text(text)
    calib = UniversalCalibration().load_from(path)
    np.testing.assert_allclose(calib.mono.K[0, 0], 458.654)
    assert calib.mono.width == 752
    assert calib.stereo is not None
    np.testing.assert_allclose(calib.stereo.baseline, 0.110, atol=1e-2)


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.feature.num_features = 1234
    cfg.tracking.min_inliers = 42
    cfg.optimization.solver = "adam"
    cfg.debug = True
    p = tmp_path / "cfg.json"
    cfg.save(p)
    cfg2 = Config.load(p)
    assert cfg2.feature.num_features == 1234
    assert cfg2.tracking.min_inliers == 42
    assert cfg2.optimization.solver == "adam"
    assert cfg2.debug is True


def test_dataset_source(tmp_path, rng):
    import cv2

    for i in range(5):
        img = rng.integers(0, 255, (32, 48), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"{i:06d}.png"), img)
    ds = DatasetSource(tmp_path, fps=20.0)
    assert ds.num_frames() == 5
    assert ds.get_frame_shape() == (32, 48)
    frames = []
    while ds.is_ok():
        img, ts = ds.get_frame()
        if img is None:
            break
        frames.append((img, ts))
    assert len(frames) == 5
    assert frames[2][1] == pytest.approx(2 / 20.0)
    ds.seek(1)
    img, ts = ds.get_frame()
    assert ts == pytest.approx(1 / 20.0)


def test_video_source(tmp_path, rng):
    import cv2

    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 20.0, (64, 48))
    if not w.isOpened():
        pytest.skip("no MJPG codec")
    for i in range(10):
        frame = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        w.write(frame)
    w.release()
    from visual_slam_tpu.io.source import VideoSource

    vs = VideoSource(path, target_fps=10.0)  # half source fps -> skip 2
    assert vs.get_frame_shape() == (48, 64)
    n = 0
    while vs.is_ok():
        img, ts = vs.get_frame()
        if img is None:
            break
        assert img.ndim == 2
        n += 1
    assert n == 5
    vs.release()


def test_camera_model(rng):
    K = np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]])
    cam = PinholeCamera(640, 480, K, D=[-0.2, 0.05, 0, 0, 0], baseline=0.5)
    pts = np.stack([rng.uniform(-2, 2, 20), rng.uniform(-1, 1, 20), rng.uniform(3, 9, 20)], 1)
    uv, z = cam.project(pts)
    back = cam.unproject(uv, z)
    np.testing.assert_allclose(back, pts, atol=1e-9)
    uv_l, u_r, z2 = cam.project_stereo(pts)
    disparity = uv_l[:, 0] - u_r
    np.testing.assert_allclose(cam.depth_from_disparity(disparity), z, rtol=1e-9)
    assert cam.bf == pytest.approx(250.0)
    # undistort round-trip via distorted projection
    assert cam.are_in_image(uv).shape == (20,)
    assert cam.fov_x_deg > 30

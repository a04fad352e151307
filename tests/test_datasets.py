"""Dataset-layout adapters on synthetic on-disk layouts."""
import numpy as np
import pytest

from visual_slam_tpu.io.datasets import (
    EurocSource,
    KittiOdometrySource,
    TumRgbdSource,
    open_dataset,
)


def _img(rng, h=32, w=48):
    return rng.integers(0, 255, (h, w), dtype=np.uint8)


def test_kitti_layout(tmp_path, rng):
    import cv2

    for cam in ("image_0", "image_1"):
        (tmp_path / cam).mkdir()
    for i in range(4):
        cv2.imwrite(str(tmp_path / "image_0" / f"{i:06d}.png"), _img(rng))
        cv2.imwrite(str(tmp_path / "image_1" / f"{i:06d}.png"), _img(rng))
    (tmp_path / "times.txt").write_text("".join(f"{0.1*i:.6f}\n" for i in range(4)))
    (tmp_path / "calib.txt").write_text(
        "P0: 700 0 300 0 0 700 200 0 0 0 1 0\nP1: 700 0 300 -350 0 700 200 0 0 0 1 0\n"
    )
    ds = KittiOdometrySource(tmp_path, stereo=True)
    assert ds.num_frames() == 4
    assert ds.calibration.stereo.baseline == pytest.approx(0.5)
    img, ts = ds.get_frame()
    assert isinstance(img, list) and len(img) == 2
    assert ts == pytest.approx(0.0)
    img, ts = ds.get_frame()
    assert ts == pytest.approx(0.1)
    # sniffer
    ds2 = open_dataset(tmp_path)
    assert isinstance(ds2, KittiOdometrySource)


def test_tum_layout(tmp_path, rng):
    import cv2

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines = ["# comment"]
    depth_lines = []
    for i in range(3):
        ts = 1000.0 + 0.05 * i
        cv2.imwrite(str(tmp_path / "rgb" / f"{ts:.4f}.png"), _img(rng))
        depth16 = (rng.uniform(0.5, 3.0, (32, 48)) * 5000).astype(np.uint16)
        cv2.imwrite(str(tmp_path / "depth" / f"{ts:.4f}.png"), depth16)
        rgb_lines.append(f"{ts:.4f} rgb/{ts:.4f}.png")
        depth_lines.append(f"{ts + 0.002:.4f} depth/{ts:.4f}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines) + "\n")
    ds = TumRgbdSource(tmp_path)
    assert ds.num_frames() == 3
    img, ts = ds.get_frame()
    assert img.shape == (32, 48)
    depth = ds.get_depth(ts)
    assert depth is not None
    assert 0.4 < depth.mean() < 3.2  # meters
    assert ds.get_depth(ts + 100.0) is None
    assert isinstance(open_dataset(tmp_path), TumRgbdSource)


def test_euroc_layout(tmp_path, rng):
    import cv2

    cam0 = tmp_path / "mav0" / "cam0"
    (cam0 / "data").mkdir(parents=True)
    rows = ["#timestamp [ns],filename"]
    for i in range(3):
        ns = 1403636579763555584 + i * 50_000_000
        cv2.imwrite(str(cam0 / "data" / f"{ns}.png"), _img(rng))
        rows.append(f"{ns},{ns}.png")
    (cam0 / "data.csv").write_text("\n".join(rows) + "\n")
    (cam0 / "sensor.yaml").write_text(
        "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
        "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n"
        "resolution: [48, 32]\n"
    )
    ds = EurocSource(tmp_path)
    assert ds.num_frames() == 3
    assert ds.calibration.K[0, 0] == pytest.approx(458.654)
    img, ts = ds.get_frame()
    assert img.shape == (32, 48)
    img2, ts2 = ds.get_frame()
    assert ts2 - ts == pytest.approx(0.05)
    assert isinstance(open_dataset(tmp_path), EurocSource)

"""Native C++ loader: decode parity vs PIL/cv2 + prefetch correctness."""
import numpy as np
import pytest

from visual_slam_tpu.io.native import NativeDatasetSource, decode_image, get_lib


@pytest.fixture(scope="module")
def lib():
    try:
        return get_lib()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


def _write_images(tmp_path, rng, n=6, h=40, w=56):
    import cv2

    paths = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w), dtype=np.uint8)
        p = tmp_path / f"{i:06d}.png"
        cv2.imwrite(str(p), img)
        paths.append((p, img))
    return paths


def test_png_gray_decode_parity(lib, tmp_path, rng):
    paths = _write_images(tmp_path, rng)
    for p, img in paths:
        out = decode_image(p)
        np.testing.assert_array_equal(out, img)


def test_png_color_decode_parity(lib, tmp_path, rng):
    import cv2

    img = rng.integers(0, 255, (30, 44, 3), dtype=np.uint8)
    p = tmp_path / "c.png"
    cv2.imwrite(str(p), img[:, :, ::-1])  # cv2 writes BGR
    out = decode_image(p)
    np.testing.assert_array_equal(out, img)


def test_pgm_ppm_bmp(lib, tmp_path, rng):
    import cv2

    g = rng.integers(0, 255, (25, 33), dtype=np.uint8)
    c = rng.integers(0, 255, (25, 33, 3), dtype=np.uint8)
    pg = tmp_path / "x.pgm"
    pp = tmp_path / "x.ppm"
    bm = tmp_path / "x.bmp"
    cv2.imwrite(str(pg), g)
    cv2.imwrite(str(pp), c[:, :, ::-1])
    cv2.imwrite(str(bm), c[:, :, ::-1])
    np.testing.assert_array_equal(decode_image(pg), g)
    np.testing.assert_array_equal(decode_image(pp), c)
    np.testing.assert_array_equal(decode_image(bm), c)


def test_prefetch_dataset_order_and_values(lib, tmp_path, rng):
    paths = _write_images(tmp_path, rng, n=10)
    ds = NativeDatasetSource(tmp_path, fps=10.0, n_workers=3, prefetch=4)
    assert ds.num_frames() == 10
    assert ds.get_frame_shape() == (40, 56)
    for i, (_, img) in enumerate(paths):
        frame, ts = ds.get_frame()
        assert frame is not None
        assert frame.dtype == np.float32
        np.testing.assert_allclose(frame, img.astype(np.float32), atol=0.5)
        assert ts == pytest.approx(i / 10.0)
    frame, _ = ds.get_frame()
    assert frame is None
    assert ds.decode_errors() == 0
    ds.release()

import numpy as np

from visual_slam_tpu.utils.serialization import (
    load_map,
    load_trajectory_tum,
    save_map,
    save_trajectory_kitti,
    save_trajectory_tum,
)


def _small_map(rng):
    import jax.numpy as jnp

    from visual_slam_tpu.map import KeyFrame, Map, MapPoint
    from visual_slam_tpu.ops.detector import Features

    m = Map()
    kfs = []
    for k in range(3):
        K = 16
        feats = Features(
            xy=jnp.asarray(rng.uniform(0, 100, (K, 2)), jnp.float32),
            response=jnp.ones(K, jnp.float32),
            angle=jnp.zeros(K, jnp.float32),
            octave=jnp.zeros(K, jnp.int32),
            size=jnp.full((K,), 31.0, jnp.float32),
            desc=jnp.asarray(rng.integers(0, 2**32, (K, 8), dtype=np.uint32)),
            valid=jnp.ones(K, bool),
        )
        kf = KeyFrame(features=[feats], timestamp=0.1 * k)
        T = np.eye(4)
        T[0, 3] = k
        kf.update_pose(T)
        m.add_keyframe(kf)
        kfs.append(kf)
    mps = []
    for i in range(10):
        mp = MapPoint(rng.uniform(-1, 1, 3), color=rng.integers(0, 255, 3).astype(np.uint8))
        m.add_map_point(mp)
        mps.append(mp)
        for k in range(3):
            kfs[k].add_map_point(0, i, mp)
    return m


def test_map_roundtrip(rng, tmp_path):
    m = _small_map(rng)
    p = tmp_path / "map.npz"
    save_map(m, p)
    m2 = load_map(p)
    assert m2.num_keyframes() == 3
    assert m2.num_map_points() == 10
    kf0_a = m.get_keyframes()[0]
    kf0_b = m2.get_keyframes()[0]
    np.testing.assert_allclose(kf0_b.T_w2c, kf0_a.T_w2c)
    np.testing.assert_array_equal(kf0_b.descriptors(0), kf0_a.descriptors(0))
    assert kf0_b.num_map_points() == kf0_a.num_map_points()
    # observation links intact
    mp = kf0_b.get_map_point(0, 0)
    assert mp is not None and mp.num_observations() == 3


def test_trajectory_formats(rng, tmp_path):
    m = _small_map(rng)
    kfs = m.get_keyframes()
    tum = tmp_path / "traj.tum"
    kitti = tmp_path / "traj.kitti"
    save_trajectory_tum(kfs, tum)
    save_trajectory_kitti(kfs, kitti)
    ts, Ts = load_trajectory_tum(tum)
    assert len(ts) == 3
    for k, kf in enumerate(kfs):
        np.testing.assert_allclose(Ts[k], np.linalg.inv(kf.T_w2c), atol=1e-5)
    rows = np.loadtxt(kitti)
    assert rows.shape == (3, 12)
    np.testing.assert_allclose(
        rows[1].reshape(3, 4), np.linalg.inv(kfs[1].T_w2c)[:3], atol=1e-5
    )


def test_ply_export(rng, tmp_path):
    from visual_slam_tpu.viz import MapVisualizer

    m = _small_map(rng)
    p = tmp_path / "map.ply"
    MapVisualizer().save_ply(m, p)
    text = p.read_text()
    assert "element vertex 10" in text


def test_feature_viz(rng):
    from visual_slam_tpu.viz import FeatureVisualizer

    img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    xy = rng.uniform(5, 50, (10, 2))
    fv = FeatureVisualizer()
    out = fv.draw_keypoints(img, xy)
    assert out.shape == (60, 80, 3)
    out2 = fv.draw_matches(img, xy, img, xy + 2)
    assert out2.shape == (120, 80, 3)

"""Concrete pipeline families. Thin, opinionated constructors over SLAM /
pipeline / parallel with the right defaults per mode."""
from __future__ import annotations

import numpy as np

from ..camera import PinholeCamera
from ..config import Config
from ..slam import SLAM


def _base_config(num_features: int) -> Config:
    cfg = Config()
    cfg.feature.num_features = num_features
    return cfg


class MonoVO(SLAM):
    """Monocular SLAM (the flagship family)."""

    def __init__(self, camera: PinholeCamera, num_features: int = 2000,
                 config: Config | None = None, **kwargs):
        cfg = config or _base_config(num_features)
        cfg.camera.sensor_type = "monocular"
        super().__init__(camera, cfg, **kwargs)


class StereoVO(SLAM):
    """Stereo SLAM: metric scale from the first frame."""

    def __init__(self, camera: PinholeCamera, num_features: int = 2000,
                 config: Config | None = None, **kwargs):
        if getattr(camera, "baseline", 0.0) <= 0:
            raise ValueError("StereoVO needs a camera with a positive baseline")
        cfg = config or _base_config(num_features)
        cfg.camera.sensor_type = "stereo"
        super().__init__(camera, cfg, **kwargs)


class RGBDVO(SLAM):
    """RGB-D SLAM: metric landmarks from depth maps."""

    def __init__(self, camera: PinholeCamera, num_features: int = 2000,
                 config: Config | None = None, **kwargs):
        cfg = config or _base_config(num_features)
        cfg.camera.sensor_type = "rgbd"
        super().__init__(camera, cfg, **kwargs)


class CompiledVO:
    """Fused device-resident frame-to-frame tracker (pipeline.py) with a
    minimal host API: feed frames, read poses. Keyframe/landmark management
    is host-driven via ``set_reference``."""

    def __init__(self, K: np.ndarray, num_features: int = 2000, **track_params):
        import jax.numpy as jnp

        from ..pipeline import make_track_step

        self.K = np.asarray(K, np.float32)
        self.step = make_track_step(
            jnp.asarray(self.K), num_features=num_features, **track_params
        )
        self.num_features = num_features
        self.state = None
        self.poses: list[np.ndarray] = []

    def set_reference(self, features, landmarks, has_landmark, T_w2c=None, seed: int = 0):
        from ..pipeline import init_track_state, swap_reference

        if self.state is None:
            self.state = init_track_state(
                features, landmarks, has_landmark,
                np.eye(4) if T_w2c is None else T_w2c, seed=seed,
            )
        else:
            self.state = swap_reference(self.state, features, landmarks, has_landmark)

    def track(self, img) -> dict:
        import jax.numpy as jnp

        if self.state is None:
            raise RuntimeError("call set_reference() first")
        self.state, out = self.step(self.state, jnp.asarray(img, jnp.float32))
        T = np.asarray(out.T_w2c)
        self.poses.append(T)
        return {"T_w2c": T, "n_inliers": int(out.n_inliers), "n_matches": int(out.n_matches)}


class BatchedVO:
    """Data-parallel multi-sequence VO over a device mesh (parallel/multiseq)."""

    def __init__(self, K: np.ndarray, mesh=None, num_features: int = 1000, **track_params):
        import jax.numpy as jnp

        from ..parallel import make_mesh
        from ..parallel.multiseq import make_batched_vo

        self.mesh = mesh if mesh is not None else make_mesh("seq")
        self.step = make_batched_vo(
            jnp.asarray(np.asarray(K, np.float32)), self.mesh,
            num_features=num_features, **track_params,
        )

    def track(self, states, imgs):
        import jax.numpy as jnp

        return self.step(states, jnp.asarray(imgs, jnp.float32))
